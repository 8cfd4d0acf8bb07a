"""CAMPPlus speaker encoder (D-TDNN w/ context-aware masking, arXiv:2303.00332),
channels-last TPU layout, wespeaker-exact micro-structure.

Equivalent of wespeaker's campplus.py (spk_model 'CAMPPlus' option in the
recipe configs, examples/voxceleb1/v2/confs/bsrnn_online.yaml:69-75,
consumed by the reference's joint models via get_speaker_model at
/root/reference/wesep/models/bsrnn.py:9,217). The graph reproduces
wespeaker's exactly so `utils/torch_port.port_wespeaker_campplus_state_dict`
can map a jointly-trained torch checkpoint losslessly
(tests/test_campplus_ws.py pins the parity against a torch twin):

  * FCM front-end: conv3x3 + BN + relu, two stages of two freq-strided
    residual blocks (stride (2,1) on the first of each), a final
    stride-(2,1) conv3x3 + BN + relu (F -> F/8), then a C-MAJOR flatten
    of (channels, freq) into the frame feature dim — torch reshapes
    (B, C, F', T) -> (B, C*F', T); on this [B, F', T, C] layout that is
    transpose-to-[B, T, C, F'] + reshape, done natively so the port
    needs no weight permutation (cf. the ResNet port's _cf_perm).
  * xvector: TDNN (conv k=5 stride 2 + BN + relu), three CAM-dense
    stages of (12, 24, 16) layers (growth 32, 4x bottleneck, kernel 3,
    dilations 1/2/2) each followed by a channel-halving transition
    (BN + relu + 1x1), a final BN + relu, TSTP pooling, and a dense
    head: 1x1 (no bias) -> affine-free BatchNorm.
  * Dense layer: BN + relu + 1x1 bottleneck, BN + relu + CAM conv; the
    CAM gate's context is global mean + ceil-mode segment means
    (seg_len 100; the LAST segment averages only the remaining frames,
    like F.avg_pool1d(ceil_mode=True)).

TPU-first choices: everything channels-last ([B, T, C] / NHWC with
freq=H) so convs lower to MXU matmuls without layout transposes; the
segment pooling is a static reshape-sum (no dynamic shapes).
"""

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.common import Conv1d
from wesep_tpu.models.speaker.pooling import get_pooling

__all__ = ["CAMPPlus"]


class BasicResBlock(nn.Module):
    """wespeaker campplus.BasicResBlock: 3x3 convs with FREQ-only stride
    (stride, 1); shortcut 1x1+BN when strided (in==out channels here)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, 1), padding=1,
            use_bias=False, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y).astype(y.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y).astype(y.dtype)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, 1),
                use_bias=False, name="shortcut_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                name="shortcut_bn",
            )(residual).astype(residual.dtype)
        return nn.relu(y + residual)


class FCM(nn.Module):
    """Front-end Conv Module, [B, T, F] -> [B, T', C * F/8] (C-major)."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        # [B, T, F] -> NHWC [B, F, T, 1] (freq = H)
        x = jnp.swapaxes(feats, 1, 2)[..., None]
        x = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x).astype(x.dtype)
        x = nn.relu(x)
        for stage in (1, 2):
            for i, stride in enumerate((2, 1)):
                x = BasicResBlock(
                    self.m_channels, stride, name=f"layer{stage}_{i}",
                )(x, train)
        x = nn.Conv(
            self.m_channels, (3, 3), strides=(2, 1), padding=1,
            use_bias=False, name="conv2",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(x).astype(x.dtype)
        x = nn.relu(x)
        # C-major flatten: torch (B, C, F', T).reshape(B, C*F', T)
        b, f, t, c = x.shape
        return jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)


def _seg_mean(x, seg_len: int):
    """Ceil-mode segment means, repeated back to T frames
    (F.avg_pool1d(k=seg_len, stride=seg_len, ceil_mode=True) + expand):
    the last segment averages only the remaining T - k*seg_len frames."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    starts = jnp.arange(n_seg) * seg_len
    counts = jnp.minimum(starts + seg_len, t) - starts
    seg = sums / counts[None, :, None].astype(x.dtype)
    return jnp.repeat(seg, seg_len, axis=1)[:, :t]


class CAMLayer(nn.Module):
    """Context-aware mask: dilated conv branch gated by a context MLP
    over (global mean + ceil-mode segment means)."""

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
        ctx = jnp.mean(x, axis=1, keepdims=True) + _seg_mean(x, self.seg_len)
        m = nn.relu(
            Conv1d(self.bn_channels // self.reduction, 1, name="linear1")(ctx)
        )
        m = nn.sigmoid(Conv1d(self.out_channels, 1, name="linear2")(m))
        return y * m


class DTDNNLayer(nn.Module):
    """wespeaker CAMDenseTDNNLayer: BN-relu-1x1 bottleneck, BN-relu-CAM."""

    growth: int
    bn_size: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x).astype(x.dtype)
        y = nn.relu(y)
        y = Conv1d(self.growth * self.bn_size, 1, use_bias=False,
                   name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y).astype(y.dtype)
        y = nn.relu(y)
        y = CAMLayer(
            self.growth * self.bn_size, self.growth, self.kernel_size,
            self.dilation, name="cam",
        )(y, train)
        return jnp.concatenate([x, y], axis=-1)


class CAMPPlus(nn.Module):
    """feats [B, T, F_mel] -> embedding [B, embed_dim].

    Ctor mirrors wespeaker's (feat_dim is implied by the input shape;
    config_str/memory_efficient have no graph-shape effect and are
    accepted via recipe spk_args but ignored)."""

    feat_dim: int = 80
    embed_dim: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    pooling_func: str = "TSTP"
    # (num_layers, dilation) per dense stage; wespeaker hard-codes
    # zip((12, 24, 16), (1, 2, 2)) with kernel 3
    stages: tuple = ((12, 1), (24, 2), (16, 2))

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x = FCM(name="head")(feats, train)
        # TDNNLayer: conv k=5 stride 2 + BN + relu
        x = Conv1d(self.init_channels, 5, stride=2, padding=2,
                   use_bias=False, name="tdnn")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="tdnn_bn")(x).astype(x.dtype)
        x = nn.relu(x)
        for stage, (n_layers, dilation) in enumerate(self.stages, start=1):
            for i in range(n_layers):
                x = DTDNNLayer(
                    self.growth_rate, self.bn_size, 3, dilation,
                    name=f"block{stage}_layer{i}",
                )(x, train)
            # transition: BN + relu + channel-halving 1x1 (no bias)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"transit{stage}_bn")(x).astype(x.dtype)
            x = nn.relu(x)
            x = Conv1d(x.shape[-1] // 2, 1, use_bias=False,
                       name=f"transit{stage}_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="out_bn")(x).astype(x.dtype)
        x = nn.relu(x)
        pooled = get_pooling(self.pooling_func)(name="pool")(x, train)
        # DenseLayer(config_str='batchnorm_'): 1x1 no bias -> affine-free BN
        emb = nn.Dense(self.embed_dim, use_bias=False, name="dense")(pooled)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            use_scale=False, use_bias=False, name="dense_bn",
        )(emb).astype(emb.dtype)
