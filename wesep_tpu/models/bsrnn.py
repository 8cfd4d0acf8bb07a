"""BSRNN (band-split RNN) target-speaker extraction — TPU-native layout.

Functional redesign of /root/reference/wesep/models/bsrnn.py:151-394.

Key TPU-first decisions (vs the reference's per-band python loops):

  * The 32 sub-bands come in only 5 distinct widths (15x3, 10x6, 5x16,
    1x64, 1x8 bins at sr=16k/win=512, bsrnn.py:197-209). Bands are
    processed as width-uniform GROUPS with batched einsums
    ([n_bands, 2*bw, N] weight stacks) — no ragged loops, no padding
    waste, every band matmul lands on the MXU in one call.
  * Spectrograms are channels-last [B, T, F] so band slicing is a static
    lane-dim slice and the feature dim N=128 sits on the 128-wide lane.
  * The band/time BiLSTMs (BSNet, bsrnn.py:55-83) run as fused lax.scan
    LSTMs over large folded batches ([B*nband, T, N] and [B*T, nband, N]).
  * STFT/iSTFT are the framed-matmul kernels from wesep_tpu.ops.stft
    (torch.stft/istft parity, hann window, center+reflect).

forward contract (reference bsrnn.py:300-394):
  (mix_wav [B, T], enroll) -> (est_wav [B, T], spk_logits)
where enroll is a pre-extracted embedding [B, E] (joint_training=False),
an enrollment fbank [B, T', F_mel] (spk_feat=True), or a raw enrollment
wav [B, T_e] (joint_training + feat_type='consistent').

Per-band channel ordering matches the reference exactly
([re_0..re_bw, im_0..im_bw] per band; mask channels (2, 2, bw)) so weights
are portable. The separator is factored so BSRNN_Multi (SSA,
bsrnn_multi_optim.py) can run it twice with shared parameters.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wesep_tpu.models.common import (
    Dense,
    LSTM,
    SpeakerFuse,
    SpeakerTransform,
)
from wesep_tpu.ops.init import torch_linear_init
from wesep_tpu.ops.stft import hann_window, istft, stft

__all__ = ["BSRNN", "band_layout"]

_EPS = float(np.finfo(np.float32).eps)


def band_layout(sr: int, enc_dim: int) -> List[Tuple[int, int]]:
    """Sub-band widths -> run-length groups [(n_bands, width), ...].

    Matches the reference band plan (bsrnn.py:197-209): 15x100 Hz,
    10x200 Hz, 5x500 Hz, 1x2 kHz, then the remainder band.
    """
    bw100 = int(np.floor(100 / (sr / 2.0) * enc_dim))
    bw200 = int(np.floor(200 / (sr / 2.0) * enc_dim))
    bw500 = int(np.floor(500 / (sr / 2.0) * enc_dim))
    bw2k = int(np.floor(2000 / (sr / 2.0) * enc_dim))
    widths = [bw100] * 15 + [bw200] * 10 + [bw500] * 5 + [bw2k]
    widths.append(enc_dim - int(np.sum(widths)))
    groups: List[Tuple[int, int]] = []
    for w in widths:
        if groups and groups[-1][1] == w:
            groups[-1] = (groups[-1][0] + 1, w)
        else:
            groups.append((1, w))
    return groups


class GroupedBandNorm(nn.Module):
    """Per-band GroupNorm(1, C): normalize over (T, C) with per-band affine.

    Input [B, n, T, C]; n = bands in this width group. Equivalent to the
    reference per-band nn.GroupNorm(1, C, eps) stacks (bsrnn.py:252-258).
    """

    n_bands: int
    channels: int
    eps: float = _EPS

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "scale", nn.initializers.ones, (self.n_bands, self.channels)
        )
        beta = self.param(
            "bias", nn.initializers.zeros, (self.n_bands, self.channels)
        )
        x32 = x.astype(jnp.float32)
        # single-pass stats (E[x^2] - E[x]^2): both reductions fuse into
        # ONE read of x instead of the centered form's two serial passes
        mean = jnp.mean(x32, axis=(2, 3), keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=(2, 3), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * gamma[None, :, None, :] + beta[None, :, None, :]
        return y.astype(x.dtype)


class GroupedBandDense(nn.Module):
    """Per-band 1x1 conv as one batched einsum: [B,n,T,Cin] -> [B,n,T,Cout].

    Weight stack [n, Cin, Cout]; replaces the reference's per-band
    nn.Conv1d modules with a single MXU batched matmul.
    """

    n_bands: int
    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = torch_linear_init(cin)
        w = self.param("kernel", init, (self.n_bands, cin, self.features))
        b = self.param("bias", init, (self.n_bands, self.features))
        y = jnp.einsum(
            "bntc,ncd->bntd", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y + b[None, :, None, :]).astype(x.dtype)


class ResRNN(nn.Module):
    """norm -> BiLSTM -> linear proj -> residual (bsrnn.py:16-46).

    Input [B', S, N] (sequence in the middle); GroupNorm(1, N) normalizes
    over (S, N) per sample.
    """

    hidden: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("norm_scale", nn.initializers.ones, (c,))
        beta = self.param("norm_bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        # single-pass stats: see GroupedBandNorm
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        y = ((x32 - mean) * jax.lax.rsqrt(var + _EPS) * gamma + beta
             ).astype(x.dtype)
        y = LSTM(self.hidden, bidirectional=self.bidirectional, name="rnn")(y)
        y = Dense(c, name="proj")(y)
        return x + y


class BSNet(nn.Module):
    """One separator repeat: band RNN over time + comm RNN over bands.

    Input/output [B, nband, T, N] (reference BSNet, bsrnn.py:55-83).
    """

    feature_dim: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        b, nband, t, n = x.shape
        h = self.feature_dim * 2
        # intra-band RNN over time, bands folded into batch
        y = x.reshape(b * nband, t, n)
        y = ResRNN(h, self.bidirectional, name="band_rnn")(y)
        y = y.reshape(b, nband, t, n)
        # inter-band comm RNN over bands, frames folded into batch
        z = jnp.swapaxes(y, 1, 2).reshape(b * t, nband, n)
        z = ResRNN(h, self.bidirectional, name="band_comm")(z)
        z = jnp.swapaxes(z.reshape(b, t, nband, n), 1, 2)
        return z


class BSRNN(nn.Module):
    """Band-split RNN TSE model (reference BSRNN, bsrnn.py:151-394)."""

    spk_emb_dim: int = 256
    sr: int = 16000
    win: int = 512
    stride: int = 128
    feature_dim: int = 128
    num_repeat: int = 6
    use_spk_transform: bool = True
    use_bidirectional: bool = True
    spk_fuse_type: str = "concat"
    multi_fuse: bool = True
    joint_training: bool = True
    multi_task: bool = False
    spksInTrain: int = 251
    spk_model: Optional[str] = None
    spk_args: Optional[dict] = None
    # accepted for config parity (bsrnn.py:169-171); init-from is handled by
    # the train binary, freeze by an optimizer mask on 'spk_model/*'
    spk_model_init: Optional[str] = None
    spk_model_freeze: bool = False
    spk_feat: bool = False
    feat_type: str = "consistent"
    # rematerialize each separator repeat in backward (trades ~15% step time
    # for ~10x less HBM for the 24 LSTM scans' saved activations; without it
    # the reference envelope batch 8 x 3 s does not fit 16G HBM)
    remat: bool = True

    @property
    def enc_dim(self):
        return self.win // 2 + 1

    def _spec_map(self) -> int:
        """Input channels per frequency bin (2 = RI; BSRNN_Feats adds a
        spectral tf-map channel, bsrnn_feats.py:304-306)."""
        return 2

    def setup(self):
        groups = band_layout(self.sr, self.enc_dim)
        self.groups = groups
        self.bn_norm = [
            GroupedBandNorm(n, self._spec_map() * bw) for n, bw in groups
        ]
        self.bn_proj = [
            GroupedBandDense(n, self.feature_dim) for n, _ in groups
        ]
        n_fuse = self.num_repeat if self.multi_fuse else 1
        self.fuse = [
            SpeakerFuse(self.feature_dim, self.spk_fuse_type)
            for _ in range(n_fuse)
        ]
        bsnet_cls = nn.remat(BSNet) if self.remat else BSNet
        self.bsnet = [
            bsnet_cls(self.feature_dim, self.use_bidirectional)
            for _ in range(self.num_repeat)
        ]
        self.mask_norm = [
            GroupedBandNorm(n, self.feature_dim) for n, _ in groups
        ]
        self.mask_fc1 = [
            GroupedBandDense(n, self.feature_dim * 4) for n, _ in groups
        ]
        self.mask_fc2 = [
            GroupedBandDense(n, self.feature_dim * 4) for n, _ in groups
        ]
        self.mask_out = [
            GroupedBandDense(n, bw * 4) for n, bw in groups
        ]
        if self.use_spk_transform:
            self.spk_transform = SpeakerTransform(self.spk_emb_dim)
        if self.joint_training:
            from wesep_tpu.models.speaker import get_speaker_model

            args = dict(self.spk_args or {})
            args.pop("feat_dim", None)
            # attribute name becomes the param scope ('spk_model' is taken
            # by the config field; optimizer freeze masks use 'spk_model_net')
            self.spk_model_net = get_speaker_model(self.spk_model)(**args)
            if self.multi_task:
                self.pred_linear = Dense(self.spksInTrain)

    # --- enrollment branch (bsrnn.py:341-357) ----------------------------
    def _consistent_feats(self, wav):
        """PreEmphasis -> MelSpectrogram -> log -> mean-norm -> [B, T', M]."""
        from wesep_tpu.ops.fbank import speaker_feat

        n_mels = (self.spk_args or {}).get("feat_dim", 80)
        return speaker_feat(
            wav,
            sample_rate=self.sr,
            n_fft=self.win,
            hop_length=self.stride,
            n_mels=n_mels,
        )

    def _spk_embedding(self, enroll, train: bool, from_waveform: bool = False):
        """enroll (wav/fbank/embedding) -> (embedding, spk_logits)."""
        spk_logits = None
        if self.joint_training:
            feats = enroll
            if from_waveform or (
                not self.spk_feat and self.feat_type == "consistent"
            ):
                feats = jax.lax.stop_gradient(self._consistent_feats(enroll))
            embed = self.spk_model_net(feats, train=train)
            if isinstance(embed, (tuple, list)):
                embed = embed[-1]
            if self.multi_task:
                spk_logits = self.pred_linear(embed)
        else:
            embed = enroll
        if self.use_spk_transform:
            embed = self.spk_transform(embed)
        return embed, spk_logits

    # --- band split / separation / reconstruction ------------------------
    def _band_split(self, re, im, extra=None):
        """[B,T,F] spec -> (bottleneck feats [B,nband,T,N],
        sub specs [(re,im) [B,n,T,bw] per group]).

        `extra` (optional [B,T,F]) is appended as a third per-band channel
        block (the BSRNN_Feats tf-map, bsrnn_feats.py:494-516)."""
        b, t_frames, _ = re.shape
        feats = []
        sub_specs = []
        f0 = 0
        for gi, (n, bw) in enumerate(self.groups):
            def slice_g(a):
                g = a[..., f0 : f0 + n * bw].reshape(b, t_frames, n, bw)
                return jnp.swapaxes(g, 1, 2)  # [B, n, T, bw]

            re_g, im_g = slice_g(re), slice_g(im)
            sub_specs.append((re_g, im_g))
            parts = [re_g, im_g]
            if extra is not None:
                parts.append(slice_g(extra))
            x = jnp.concatenate(parts, axis=-1)  # [B, n, T, spec_map*bw]
            x = self.bn_norm[gi](x)
            x = self.bn_proj[gi](x)
            feats.append(x)
            f0 += n * bw
        return jnp.concatenate(feats, axis=1), sub_specs

    def _separate(self, feats, sub_specs, embed, nsample, window):
        """Separator repeats + per-band complex masking + iSTFT -> [B, T]."""
        x = feats
        if self.multi_fuse:
            for r in range(self.num_repeat):
                x = self.fuse[r](x, embed)
                x = self.bsnet[r](x)
        else:
            x = self.fuse[0](x, embed)
            for r in range(self.num_repeat):
                x = self.bsnet[r](x)

        return self._mask_reconstruct(x, sub_specs, nsample, window)

    def _mask_reconstruct(self, x, sub_specs, nsample, window):
        """Per-band tanh-gated complex masks + reassembly + iSTFT
        (bsrnn.py:271-282, 365-389). x: [B, nband, T, N]."""
        b, _, t_frames, _ = x.shape
        est_re_parts, est_im_parts = [], []
        band0 = 0
        for gi, (n, bw) in enumerate(self.groups):
            xg = x[:, band0 : band0 + n]  # [B, n, T, N]
            y = self.mask_norm[gi](xg)
            y = jnp.tanh(self.mask_fc1[gi](y))
            y = jnp.tanh(self.mask_fc2[gi](y))
            y = self.mask_out[gi](y)
            # channel layout (2, 2, bw): [gate, filter] x [real, imag]
            y = y.reshape(y.shape[:3] + (2, 2, bw))
            m = y[..., 0, :, :] * jax.nn.sigmoid(y[..., 1, :, :])
            m_re, m_im = m[..., 0, :], m[..., 1, :]  # [B, n, T, bw]
            s_re, s_im = sub_specs[gi]
            est_re_parts.append(s_re * m_re - s_im * m_im)
            est_im_parts.append(s_re * m_im + s_im * m_re)
            band0 += n

        def merge(parts):
            cols = [
                jnp.swapaxes(p, 1, 2).reshape(b, t_frames, -1) for p in parts
            ]
            return jnp.concatenate(cols, axis=-1)

        return istft(
            merge(est_re_parts),
            merge(est_im_parts),
            self.win,
            self.stride,
            window=window,
            length=nsample,
        )

    def __call__(self, mix, enroll, train: bool = True):
        b, nsample = mix.shape
        window = hann_window(self.win)
        re, im = stft(mix, self.win, self.stride, window=window)  # [B,T,F]
        feats, sub_specs = self._band_split(re, im)
        embed, spk_logits = self._spk_embedding(enroll, train)
        s = self._separate(feats, sub_specs, embed, nsample, window)
        return s, spk_logits
