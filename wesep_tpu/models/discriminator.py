"""CMGAN metric discriminator (Interspeech 2022, arXiv:2203.15149).

Equivalent of /root/reference/wesep/modules/metric_gan/discriminator.py:
stacked spectral-norm conv2d blocks over the stacked magnitude spectrograms
of (reference, estimate), adaptive max-pool, spectral-norm FC stack, and a
LearnableSigmoid head predicting the normalized perceptual metric (PESQ).
NHWC layout; spectral norm via flax nn.SpectralNorm (power iteration state
lives in the 'batch_stats' collection).
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.dpccn import instance_norm
from wesep_tpu.ops.stft import hann_window, magnitude, stft

__all__ = ["CMGANDiscriminator"]


class _PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25), (self.channels,)
        )
        return jnp.where(x >= 0, x, alpha * x)


class LearnableSigmoid(nn.Module):
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones, (x.shape[-1],))
        return self.beta * nn.sigmoid(slope * x)


class CMGANDiscriminator(nn.Module):
    n_fft: int = 400
    hop: int = 100
    in_channels: int = 2
    hid_chans: int = 16
    ksz: Tuple[int, int] = (4, 4)
    stride: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    bias: bool = False
    num_conv_blocks: int = 4
    num_linear_layers: int = 2

    @nn.compact
    def __call__(self, ref_wav, est_wav, train: bool = True):
        """(ref [B,T], est [B,T]) -> predicted normalized metric [B, 1]."""
        window = hann_window(self.n_fft)
        rr, ri = stft(ref_wav, self.n_fft, self.hop, window=window)
        er, ei = stft(est_wav, self.n_fft, self.hop, window=window)
        # [B, T', F, 2] channels-last (reference stacks (|ref|, |est|) as
        # NCHW [B, 2, T, F])
        x = jnp.stack([magnitude(rr, ri), magnitude(er, ei)], axis=-1)

        out_ch = self.hid_chans
        for i in range(self.num_conv_blocks):
            conv = nn.Conv(
                out_ch,
                self.ksz,
                strides=self.stride,
                padding=[(p, p) for p in self.padding],
                use_bias=self.bias,
                name=f"conv_{i}",
            )
            x = nn.SpectralNorm(conv)(x, update_stats=train)
            # InstanceNorm2d(affine=True)
            x = instance_norm(x)
            gamma = self.param(
                f"in_scale_{i}", nn.initializers.ones, (out_ch,)
            )
            beta = self.param(
                f"in_bias_{i}", nn.initializers.zeros, (out_ch,)
            )
            x = x * gamma + beta
            x = _PReLU(out_ch, name=f"prelu_{i}")(x)
            out_ch = self.hid_chans * (2 ** (i + 1))

        # AdaptiveMaxPool2d(1) + flatten
        x = jnp.max(x, axis=(1, 2))  # [B, C]

        for i in range(self.num_linear_layers - 1):
            feats = self.hid_chans * (
                2 ** (self.num_conv_blocks - 2 - i)
            )
            dense = nn.Dense(feats, name=f"fc_{i}")
            x = nn.SpectralNorm(dense)(x, update_stats=train)
            x = nn.Dropout(0.3, deterministic=not train)(x)
            x = _PReLU(feats, name=f"fc_prelu_{i}")(x)
        final = nn.Dense(1, name="fc_final")
        x = nn.SpectralNorm(final)(x, update_stats=train)
        return LearnableSigmoid(name="lsigmoid")(x)
