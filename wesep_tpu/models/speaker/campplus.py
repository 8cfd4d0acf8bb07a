"""CAMPPlus speaker encoder (D-TDNN w/ context-aware masking, arXiv:2303.00332),
channels-last TPU layout.

Equivalent of wespeaker's campplus.py (spk_model 'CAMPPlus' option in the
recipe configs, examples/librimix/tse/v2/confs/bsrnn.yaml:71-77).

Topology (faithful at the block level): FCM front-end (2-D convs over
freq), then 3 dense D-TDNN stages (growth 32, bottleneck 4x, kernels 3,
dilations 1/2/2) with transition convs, then TSTP pooling + dense embed.
"""

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.common import Conv1d
from wesep_tpu.models.speaker.pooling import get_pooling

__all__ = ["CAMPPlus"]


class FCM(nn.Module):
    """Front-end Conv Module: 2-D residual convs over (freq, time), stride 2
    on freq, producing [B, T, C * F/2]."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        # [B, T, F] -> [B, F, T, 1]
        x = jnp.swapaxes(feats, 1, 2)[..., None]
        x = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        for i, stride in enumerate((2, 2)):
            residual = x
            y = nn.Conv(
                self.m_channels, (3, 3), strides=(stride, 1), padding=1,
                use_bias=False, name=f"block{i}_conv1",
            )(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"block{i}_bn1")(y)
            y = nn.relu(y)
            y = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                        name=f"block{i}_conv2")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"block{i}_bn2")(y)
            residual = nn.Conv(
                self.m_channels, (1, 1), strides=(stride, 1), use_bias=False,
                name=f"block{i}_short",
            )(residual)
            x = nn.relu(y + residual)
        b, f, t, c = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(b, t, f * c)


class CAMLayer(nn.Module):
    """Context-aware mask: depth conv branch gated by a context MLP over
    (global + segment-pooled) statistics."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel_size - 1) // 2
        y = Conv1d(
            self.out_channels, self.kernel_size, dilation=self.dilation,
            padding=pad, use_bias=False, name="linear_local",
        )(x)
        # context: global mean + segment means
        b, t, c = x.shape
        g = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, C]
        n_seg = max(t // self.seg_len, 1)
        trim = n_seg * self.seg_len
        seg = x[:, :trim].reshape(b, n_seg, -1, c).mean(axis=2)  # [B,S,C]
        seg = jnp.repeat(seg, self.seg_len, axis=1)
        if seg.shape[1] < t:
            seg = jnp.concatenate(
                [seg, jnp.broadcast_to(seg[:, -1:], (b, t - seg.shape[1], c))],
                axis=1,
            )
        else:
            seg = seg[:, :t]
        ctx = g + seg
        m = nn.relu(nn.Dense(self.bn_channels // self.reduction,
                             name="linear1")(ctx))
        m = nn.sigmoid(nn.Dense(self.out_channels, name="linear2")(m))
        return y * m


class DTDNNLayer(nn.Module):
    """Dense TDNN layer: BN-relu-conv1 bottleneck, BN-relu-CAM conv."""

    growth: int
    bn_size: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        y = nn.relu(y)
        y = Conv1d(self.growth * self.bn_size, 1, use_bias=False,
                   name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        y = nn.relu(y)
        y = CAMLayer(
            self.growth * self.bn_size, self.growth, self.kernel_size,
            self.dilation, name="cam",
        )(y, train)
        return jnp.concatenate([x, y], axis=-1)


class CAMPPlus(nn.Module):
    embed_dim: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    pooling_func: str = "TSTP"

    @nn.compact
    def __call__(self, feats, train: bool = True):
        """feats: [B, T, F_mel] -> embedding [B, embed_dim]."""
        x = FCM(name="head")(feats, train)
        x = Conv1d(self.init_channels, 5, stride=2, padding=2,
                   use_bias=False, name="tdnn")(x)
        for stage, (n_layers, dilation) in enumerate(
            ((12, 1), (24, 2), (16, 2))
        ):
            for i in range(n_layers):
                x = DTDNNLayer(
                    self.growth_rate, self.bn_size, 3, dilation,
                    name=f"block{stage}_layer{i}",
                )(x, train)
            # transition: halve channels
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"transit{stage}_bn")(x)
            x = nn.relu(x)
            x = Conv1d(x.shape[-1] // 2, 1, use_bias=False,
                       name=f"transit{stage}_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="final_bn")(x)
        x = nn.relu(x)
        pooled = get_pooling(self.pooling_func)(name="pool")(x, train)
        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              name="embed_bn")(pooled)
        return nn.Dense(self.embed_dim, use_bias=False, name="embed")(pooled)
