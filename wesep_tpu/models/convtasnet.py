"""ConvTasNet / SpEx+ target-speaker extraction, channels-last TPU layout.

Functional re-design of /root/reference/wesep/models/convtasnet.py and
/root/reference/wesep/modules/tasnet/{convs,encoder,decoder,separation,
speaker}.py. All features are [B, T, C] (channels on the TPU lane dim);
convolutions are flax NWC convs which XLA lowers to MXU matmuls.

Capabilities (parity targets):
  * Multi-scale encoder/decoder (SpEx+, L=20/80/160, shared between the
    mixture and enrollment branches) — encoder.py:63-114, decoder.py:60-114.
  * Deep and plain single-scale encoder/decoder variants.
  * TCN separator: R repeats x X dilated conv blocks, residual (+skip).
  * Speaker fusion: 'concatConv' (concat tiled embedding before the first
    conv block of each repeat) or concat/additive/multiply/FiLM.
  * Joint training with an in-model ResNet speaker encoder over the shared
    learned encoder features (speaker.py:48-64); optional CE head.

forward contract: (mix [B,T], enroll) -> (ests, spk_logits) where ests is a
list [est1, est2, est3] for the multi-decoder (multi-scale SI-SDR loss,
confs/spexplus.yaml:27-30) or a single [B, T] array otherwise; spk_logits
is None unless multi_task.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.common import (
    ChannelLayerNorm,
    Conv1d,
    Dense,
    GlobalLayerNorm,
    PReLU,
    SpeakerFuse,
    SpeakerTransform,
    get_norm,
    norm_auto_name,
)


def _gln_dconv_commuted(p, dconv, gln):
    """dconv(gLN(p)) computed as an affine of dconv(p).

    gLN's affine is constant over time per (batch, channel) and a
    depthwise conv is per-channel linear, so
        dconv(a*p + c) = a*dconv_nobias(p) + c*sum_k(w) + b_d,
    with one boundary correction: the plain path zero-pads the
    NORMALIZED signal, so taps that fall into the padding contribute 0
    there but would contribute c*w_k here — subtract c*w_k for every
    out-of-range tap (an iota-mask elementwise term XLA fuses away).
    This removes the serialization between the global-stats reduction
    and the conv: XLA computes dconv(p) and the stats of p in the SAME
    HBM pass over p and fuses the affine into the consumer, cutting the
    TCN block's array round-trips (the SpEx+ step is HBM-bound on
    exactly these [B, T', H] passes — BASELINE.md SpEx+ note).
    Numerically identical up to fp reassociation.
    """
    dt = p.dtype
    a, caff = gln(p)  # [B, 1, C] f32 each (stats stay f32)
    z = dconv(p)  # includes the conv bias; dt stream
    kern = dconv.get_variable("params", "kernel")  # [k, 1, C]
    bd = dconv.get_variable("params", "bias").astype(dt)  # [C]
    k32 = kern.astype(jnp.float32)
    # per-output-position sum of IN-range tap weights (edges differ:
    # sw_t[t] == sum_k(w_k) in the interior, smaller near the edges)
    t_len = p.shape[1]
    k_size, dil = kern.shape[0], dconv.dilation
    # flax freezes module attrs, so list padding arrives as a tuple
    pad_lo = (dconv.padding if isinstance(dconv.padding, int)
              else dconv.padding[0][0])
    tpos = jnp.arange(t_len)
    sw_t = jnp.zeros((t_len, kern.shape[-1]), jnp.float32)
    for k in range(k_size):
        tap = tpos + k * dil - pad_lo
        inr = ((tap >= 0) & (tap < t_len)).astype(jnp.float32)
        sw_t = sw_t + inr[:, None] * k32[k, 0][None, :]
    # apply the affine in the COMPUTE dtype: the [B, T, C] elementwise
    # stream and its adjoints would otherwise run (and spill) in f32 —
    # the xplane r4 attribution showed the SpEx+ step dominated by f32
    # kLoop passes over exactly these tensors
    return (a.astype(dt) * (z - bd)
            + caff.astype(dt) * sw_t.astype(dt) + bd)


def _gln_conv1x1_applied(y, conv, a, caff):
    """conv1x1(a*y + caff) as conv1x1(a*y) + W^T caff.

    The 1x1 conv mixes channels, so the per-channel gLN affine (a, caff)
    cannot move past it as an affine — but conv(a*y + c) =
    conv_nobias(a*y) + W^T c + b is exact (no padding taps at kernel
    size 1). This skips the separate materialization of the normalized
    tensor: the matmul reads a*y (one fused elementwise producer) and
    the constant-over-time correction W^T c is a [B, 1, F] term XLA
    folds into the output fusion. Companion of _gln_dconv_commuted for
    the block's second gLN; takes (a, caff) so the skip-connection conv
    can reuse one affine.
    """
    dt = y.dtype
    z = conv(a.astype(dt) * y)  # has bias; dt stream end to end
    # W^T caff via two length-1 conv calls (shared params): the 1x1
    # kernel lives in Conv1d's inner nn.Conv scope, and conv(c) -
    # conv(0) strips the bias exactly. [B, 1, C] x [C, F] — negligible.
    cb = caff.astype(dt)
    corr = conv(cb) - conv(jnp.zeros_like(cb))
    return z + corr

__all__ = ["ConvTasNet"]


def _tcn_kernel_ok(x, conv_channels):
    """Route the block through the fused Pallas kernel
    (ops/pallas_tcn.tcn_block_gln)? Needs Pallas (interpret off-TPU is
    used by tests via the same path), and on a real chip the two
    full-stream VMEM scratches must fit (bf16 at the SpEx+ envelope
    ~11 MB; f32 at T=4799 would not — falls back to the XLA
    fuse_gln path)."""
    import os

    flag = os.environ.get("WESEP_TCN_PALLAS", "1")
    if flag == "0":
        return False
    from wesep_tpu.ops.pallas_tcn import _RC_BWD, _ceil_to, pallas_available

    on_tpu = pallas_available()
    if not on_tpu and flag != "force":
        # off-TPU the kernel runs in (slow) interpret mode — only the
        # dedicated parity tests opt in
        return False
    t_len = x.shape[1]
    scratch = 2 * (_ceil_to(t_len, _RC_BWD) + 512) * conv_channels
    scratch *= x.dtype.itemsize
    if on_tpu and scratch > 12 * 1024 * 1024:
        return False
    return True


def _tcn_kernel_apply(block, x, embed=None):
    """Shared fused-kernel path for TCNBlock / FuseTCNBlock.

    Creates the SAME submodules (names, param shapes) as the XLA paths
    via zero-cost dummy calls (XLA dead-code-eliminates them), then
    hands the raw params to ops/pallas_tcn.tcn_block_gln. For
    FuseTCNBlock, concat([x, e]) @ W1 == x @ W1[:C] + e @ W1[C:], so
    the embedding folds into the per-batch effective bias b1_eff."""
    from wesep_tpu.models.common import GlobalLayerNorm, PReLU, norm_auto_name
    from wesep_tpu.ops.pallas_tcn import tcn_block_gln

    in_ch = x.shape[-1]
    h = block.conv_channels
    mm_ch = in_ch + (embed.shape[-1] if embed is not None else 0)
    dummy = lambda c: jnp.zeros((1, 1, c), x.dtype)  # noqa: E731

    conv1 = Conv1d(h, 1, name="Conv1d_0")
    _ = conv1(dummy(mm_ch))
    w1_full = conv1.variables["params"]["Conv_0"]["kernel"][0]
    b1 = conv1.variables["params"]["Conv_0"]["bias"]
    prelu0 = PReLU(name="PReLU_0")
    _ = prelu0(dummy(1))
    p0 = prelu0.get_variable("params", "alpha")[0]
    gln0 = GlobalLayerNorm(return_affine=True,
                           name=norm_auto_name("gLN", 0))
    _ = gln0(dummy(h))
    pad = (
        block.dilation * (block.kernel_size - 1) // 2
        if not block.causal
        else block.dilation * (block.kernel_size - 1)
    )
    dconv = Conv1d(
        h, block.kernel_size, dilation=block.dilation, groups=h,
        padding=[(pad, 0)] if block.causal else pad, name="Conv1d_1",
    )
    _ = dconv(dummy(h))
    kd = dconv.get_variable("params", "kernel")[:, 0, :]
    bd = dconv.get_variable("params", "bias")
    prelu1 = PReLU(name="PReLU_1")
    _ = prelu1(dummy(1))
    p1 = prelu1.get_variable("params", "alpha")[0]
    gln1 = GlobalLayerNorm(return_affine=True,
                           name=norm_auto_name("gLN", 1))
    _ = gln1(dummy(h))
    conv2 = Conv1d(in_ch, 1, name="Conv1d_2")
    _ = conv2(dummy(h))
    w2 = conv2.variables["params"]["Conv_0"]["kernel"][0]
    b2 = conv2.variables["params"]["Conv_0"]["bias"]

    b1_eff = jnp.broadcast_to(b1[None, :], (x.shape[0], h))
    if embed is not None:
        b1_eff = b1_eff + embed @ w1_full[in_ch:]
    w1 = w1_full[:in_ch]
    # the kernel includes the residual: y = x + conv2(...)
    return tcn_block_gln(
        x, b1_eff, w1, p0, kd, bd,
        gln0.get_variable("params", "weight"),
        gln0.get_variable("params", "bias"),
        p1, w2, b2,
        gln1.get_variable("params", "weight"),
        gln1.get_variable("params", "bias"),
        block.dilation, block.kernel_size, block.causal,
        GlobalLayerNorm.eps, block.valid_len,
    )


class _OverlapAddDeconv(nn.Module):
    """nn.ConvTranspose-compatible params (kernel [k, Cin, F], bias [F])
    computed as ONE matmul + static shift-add overlap-add.

    XLA lowers a stride-s ConvTranspose as an input-dilated dense conv:
    out_len x k x Cin MACs (~255 GFLOP/step for the three SpEx+ decoders
    vs their ~5 GFLOP matmul content — measured 8.3 ms/step, r5 xplane).
    Here: windows = x @ W ([B*T', Cin] @ [Cin, k*F], MXU-shaped), then
    ceil(k/s) static shifted adds place the windows at stride s — the
    overlap_and_add form of the reference (wesep/utils/funcs.py:10-56).
    Exact same math and param tree as nn.ConvTranspose VALID."""

    features: int
    kernel_size: int
    stride: int
    kernel_init: object = None
    bias_init: object = None

    @nn.compact
    def __call__(self, x):
        b, t, cin = x.shape
        k, s, f = self.kernel_size, self.stride, self.features
        kernel = self.param(
            "kernel", self.kernel_init, (k, cin, f)
        ).astype(x.dtype)
        bias = self.param("bias", self.bias_init, (f,)).astype(x.dtype)
        # flax transpose_kernel=False applies the kernel spatially
        # REVERSED relative to the torch out[n] = sum_t x[t] K[n-t*s]
        # form (the torch-port stores it pre-flipped, torch_port.py:
        # _convtrans1d_sd); flip back so tap j lands at offset j
        windows = jnp.einsum(
            "btc,kcf->btkf", x, kernel[::-1],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        g = -(-k // s)  # taps grouped s-wide -> g static shifted adds
        if g * s != k:
            windows = jnp.pad(
                windows, ((0, 0), (0, 0), (0, g * s - k), (0, 0))
            )
        windows = windows.reshape(b, t, g, s, f)
        out_len = (t - 1) * s + k
        out = jnp.zeros((b, t * s + (g - 1) * s, f), x.dtype)
        for j in range(g):
            out = out.at[:, j * s:(j + t) * s].add(
                windows[:, :, j].reshape(b, t * s, f)
            )
        return out[:, :out_len] + bias


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv on [B, T, C] (VALID padding = torch padding=0)."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        from wesep_tpu.ops.init import torch_linear_init

        # torch ConvTranspose1d fan_in = out_channels/groups * kernel
        init = torch_linear_init(self.features * self.kernel_size)
        # named like the nn.ConvTranspose it replaces -> identical
        # checkpoint/torch-port param paths (dec_*/ConvTranspose_0/...)
        return _OverlapAddDeconv(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            kernel_init=init,
            bias_init=init,
            name="ConvTranspose_0",
        )(x)


class TCNBlock(nn.Module):
    """1x1 -> PReLU -> norm -> depthwise dilated conv -> PReLU -> norm -> 1x1.

    Residual output (+ optional skip path), cf. Conv1DBlock
    (/root/reference/wesep/modules/tasnet/convs.py:43-104).
    """

    conv_channels: int = 512
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "gLN"
    causal: bool = False
    skip_con: bool = False
    # commute gLN past the depthwise conv (see _gln_dconv_commuted);
    # gLN only — cLN stats vary over time and do not commute
    fuse_gln: bool = False
    # whole-block fused Pallas kernel (ops/pallas_tcn.py): identical
    # param tree, HBM sees only read-x/write-y per block
    pallas_tcn: bool = False
    # pre-padded stack mode (see tcn_block_gln valid_len): only the
    # kernel path understands padded streams
    valid_len: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        if (
            self.pallas_tcn
            and self.norm == "gLN"
            and not self.skip_con
            and _tcn_kernel_ok(x, self.conv_channels)
        ):
            return _tcn_kernel_apply(self, x)
        if self.valid_len is not None:
            raise ValueError(
                "valid_len (pre-padded stream) requires the Pallas "
                "kernel route; the XLA path would fold pad rows into "
                "the gLN stats"
            )
        in_ch = x.shape[-1]
        pad = (
            self.dilation * (self.kernel_size - 1) // 2
            if not self.causal
            else self.dilation * (self.kernel_size - 1)
        )
        # all submodules carry their historical auto-names explicitly:
        # the fused/plain paths create different module sequences but
        # must produce the IDENTICAL checkpoint param tree
        c = Conv1d(self.conv_channels, 1, name="Conv1d_0")(x)
        c = PReLU(name="PReLU_0")(c)
        fused = self.fuse_gln and self.norm == "gLN"
        dconv = Conv1d(
            self.conv_channels,
            self.kernel_size,
            dilation=self.dilation,
            groups=self.conv_channels,
            padding=[(pad, 0)] if self.causal else pad,
            name="Conv1d_1",
        )
        if fused:
            gln = GlobalLayerNorm(return_affine=True,
                                  name=norm_auto_name("gLN", 0))
            c = _gln_dconv_commuted(c, dconv, gln)
        else:
            c = get_norm(self.norm, name=norm_auto_name(self.norm, 0))(c)
            c = dconv(c)
        c = PReLU(name="PReLU_1")(c)
        conv_out = Conv1d(in_ch, 1, name="Conv1d_2")
        if fused:
            gln1 = GlobalLayerNorm(return_affine=True,
                                   name=norm_auto_name("gLN", 1))
            a1, c1 = gln1(c)
            out = _gln_conv1x1_applied(c, conv_out, a1, c1)
            if self.skip_con:
                skip = _gln_conv1x1_applied(
                    c, Conv1d(in_ch, 1, name="Conv1d_3"), a1, c1)
                return skip, x + out
            return x + out
        c = get_norm(self.norm, name=norm_auto_name(self.norm, 1))(c)
        out = conv_out(c)
        if self.skip_con:
            skip = Conv1d(in_ch, 1, name="Conv1d_3")(c)
            return skip, x + out
        return x + out


class FuseTCNBlock(nn.Module):
    """TCN block with the speaker embedding concatenated at the input 1x1.

    'concatConv' fusion, cf. Conv1DBlock4Fuse (convs.py:107-160).
    """

    conv_channels: int = 512
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "cLN"
    causal: bool = False
    fuse_gln: bool = False  # see TCNBlock.fuse_gln
    pallas_tcn: bool = False  # see TCNBlock.pallas_tcn
    valid_len: Optional[int] = None  # see TCNBlock.valid_len

    @nn.compact
    def __call__(self, x, embed):
        if (
            self.pallas_tcn
            and self.norm == "gLN"
            and _tcn_kernel_ok(x, self.conv_channels)
        ):
            return _tcn_kernel_apply(self, x, embed=embed)
        if self.valid_len is not None:
            raise ValueError(
                "valid_len (pre-padded stream) requires the Pallas "
                "kernel route"
            )
        in_ch = x.shape[-1]
        tile = jnp.broadcast_to(
            embed[:, None, :], x.shape[:-1] + (embed.shape[-1],)
        )
        y = jnp.concatenate([x, tile], axis=-1)
        y = Conv1d(self.conv_channels, 1, name="Conv1d_0")(y)
        y = PReLU(name="PReLU_0")(y)
        pad = (
            self.dilation * (self.kernel_size - 1) // 2
            if not self.causal
            else self.dilation * (self.kernel_size - 1)
        )
        dconv = Conv1d(
            self.conv_channels,
            self.kernel_size,
            dilation=self.dilation,
            groups=self.conv_channels,
            padding=[(pad, 0)] if self.causal else pad,
            name="Conv1d_1",
        )
        fused = self.fuse_gln and self.norm == "gLN"
        if fused:
            gln = GlobalLayerNorm(return_affine=True,
                                  name=norm_auto_name("gLN", 0))
            y = _gln_dconv_commuted(y, dconv, gln)
        else:
            y = get_norm(self.norm, name=norm_auto_name(self.norm, 0))(y)
            y = dconv(y)
        y = PReLU(name="PReLU_1")(y)
        conv_out = Conv1d(in_ch, 1, name="Conv1d_2")
        if fused:
            gln1 = GlobalLayerNorm(return_affine=True,
                                   name=norm_auto_name("gLN", 1))
            a1, c1 = gln1(y)
            y = _gln_conv1x1_applied(y, conv_out, a1, c1)
        else:
            y = conv_out(
                get_norm(self.norm, name=norm_auto_name(self.norm, 1))(y))
        return x + y


class TCNStack(nn.Module):
    """R x X dilated TCN blocks (dilation 2^x), cf. Separation
    (separation.py:8-57)."""

    R: int = 3
    X: int = 8
    conv_channels: int = 512
    kernel_size: int = 3
    norm: str = "gLN"
    causal: bool = False
    skip_con: bool = False
    start_dilation: int = 0
    # rematerialize each block in backward: the TCN is HBM-traffic
    # bound (BASELINE.md SpEx+ analysis), so recomputing can beat
    # saving/reloading the [B, T', H] intermediates
    remat: bool = False
    fuse_gln: bool = False  # see TCNBlock.fuse_gln
    pallas_tcn: bool = False  # see TCNBlock.pallas_tcn
    valid_len: Optional[int] = None  # see TCNBlock.valid_len

    @nn.compact
    def __call__(self, x):
        skip_sum = 0.0
        blk_cls = nn.remat(TCNBlock) if self.remat else TCNBlock
        for _ in range(self.R):
            for p in range(self.start_dilation, self.X):
                blk = blk_cls(
                    conv_channels=self.conv_channels,
                    kernel_size=self.kernel_size,
                    dilation=2**p,
                    norm=self.norm,
                    causal=self.causal,
                    skip_con=self.skip_con,
                    fuse_gln=self.fuse_gln,
                    pallas_tcn=self.pallas_tcn,
                    valid_len=self.valid_len,
                )
                if self.skip_con:
                    skip, x = blk(x)
                    skip_sum = skip_sum + skip
                else:
                    x = blk(x)
        return skip_sum if self.skip_con else x


class MultiScaleEncoder(nn.Module):
    """3 parallel learned conv encoders (short/middle/long filters).

    cf. MultiEncoder (encoder.py:63-114): stride = L1//2 for all scales,
    inputs right-padded so all scales produce the same n_frames.
    Returns (bottleneck [B,T',B_ch], w1, w2, w3 [B,T',N]).
    """

    middle_channels: int = 256
    out_channels: int = 256
    L1: int = 20
    L2: int = 80
    L3: int = 160

    @nn.compact
    def __call__(self, x):
        # x: [B, T] waveform
        stride = self.L1 // 2
        x = x[..., None]  # [B, T, 1]
        t = x.shape[1]
        n_frames = (t - self.L1) // stride + 1
        w1 = nn.relu(
            Conv1d(self.middle_channels, self.L1, stride=stride, name="enc_short")(x)
        )
        pad2 = (n_frames - 1) * stride + self.L2 - t
        pad3 = (n_frames - 1) * stride + self.L3 - t
        x2 = jnp.pad(x, ((0, 0), (0, max(pad2, 0)), (0, 0)))
        x3 = jnp.pad(x, ((0, 0), (0, max(pad3, 0)), (0, 0)))
        w2 = nn.relu(
            Conv1d(self.middle_channels, self.L2, stride=stride, name="enc_middle")(x2)
        )
        w3 = nn.relu(
            Conv1d(self.middle_channels, self.L3, stride=stride, name="enc_long")(x3)
        )
        cat = jnp.concatenate([w1, w2, w3], axis=-1)
        e = ChannelLayerNorm()(cat)
        e = Conv1d(self.out_channels, 1, name="proj")(e)
        return e, w1, w2, w3


class DeepEncoder(nn.Module):
    """Strided conv + 4 dilated convs w/ PReLU (encoder.py:9-61)."""

    out_channels: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = x[..., None]
        y = Conv1d(self.out_channels, self.kernel_size, stride=self.stride)(x)
        for d in (1, 2, 4, 8):
            y = Conv1d(self.out_channels, 3, dilation=d, padding=d)(y)
            y = PReLU()(y)
        return y


class ResBlockSpk(nn.Module):
    """Pointwise residual block with BN + PReLU + maxpool3 (speaker.py:17-46)."""

    out_dims: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dims = x.shape[-1]
        residual = x
        y = Conv1d(self.out_dims, 1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y).astype(y.dtype)
        y = PReLU()(y)
        y = Conv1d(self.out_dims, 1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y).astype(y.dtype)
        if in_dims != self.out_dims:
            residual = Conv1d(self.out_dims, 1, use_bias=False)(residual)
        y = PReLU()(y + residual)
        # MaxPool1d(3): non-overlapping window 3, floor division of length
        t = y.shape[1] - y.shape[1] % 3
        y = y[:, :t].reshape(y.shape[0], t // 3, 3, y.shape[-1]).max(axis=2)
        return y


class SpExSpeakerEncoder(nn.Module):
    """SpEx+ speaker encoder over shared encoder features (speaker.py:48-64).

    cLN -> 1x1 -> ResBlock(256) -> ResBlock(512) -> ResBlock(512) -> 1x1 ->
    mean over time -> [B, E].
    """

    embed_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = ChannelLayerNorm()(x)
        y = Conv1d(256, 1)(y)
        y = ResBlockSpk(256)(y, train)
        y = ResBlockSpk(512)(y, train)
        y = ResBlockSpk(512)(y, train)
        y = Conv1d(self.embed_dim, 1)(y)
        return jnp.mean(y, axis=1)


class ConvTasNet(nn.Module):
    """SpEx+/ConvTasNet TSE model.

    Hyperparameters mirror the reference constructor
    (/root/reference/wesep/models/convtasnet.py:16-64); default config
    matches confs/spexplus.yaml.
    """

    N: int = 256
    L: int = 20
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 4
    spk_emb_dim: int = 256
    norm: str = "gLN"
    activate: str = "relu"
    causal: bool = False
    skip_con: bool = False
    spk_fuse_type: str = "concatConv"
    multi_fuse: bool = True
    use_spk_transform: bool = False
    encoder_type: str = "Multi"  # 'Multi' | 'Deep' | None
    decoder_type: str = "Multi"
    joint_training: bool = True
    multi_task: bool = False
    spks_in_train: int = 251
    spk_feat: bool = False
    feat_type: str = "consistent"
    remat: bool = False  # rematerialize TCN blocks (see TCNStack.remat)
    # commute gLN past the depthwise conv in every TCN block — exact up
    # to fp reassociation, cuts the HBM passes the SpEx+ step is bound
    # by (see _gln_dconv_commuted); no-op unless norm == 'gLN'.
    # Default ON: measured 133.6 -> 126.4 ms/step (batch 8 x 3 s, v5e)
    # with identical param tree, so checkpoints are unaffected.
    fuse_gln: bool = True
    # whole-block fused Pallas TCN kernel (ops/pallas_tcn.py): the
    # stream stays VMEM-resident per block, HBM sees only read-x/
    # write-y (fwd) and read-x/read-dy/write-dx (bwd). Identical param
    # tree; exact parity tests/test_pallas_tcn.py. Applies on TPU when
    # norm == 'gLN' and skip_con is off; falls back to fuse_gln
    # otherwise (WESEP_TCN_PALLAS=0 disables).
    pallas_tcn: bool = True

    def _activation(self, x):
        if self.activate == "relu":
            return nn.relu(x)
        if self.activate == "sigmoid":
            return nn.sigmoid(x)
        if self.activate == "softmax":
            return nn.softmax(x, axis=0)
        raise ValueError(self.activate)

    @nn.compact
    def __call__(self, mix, enroll, train: bool = True):
        """mix: [B, T] wav. enroll: [B, T_e] wav (joint) or [B, E] embedding."""
        spk_logits = None

        w1 = w2 = w3 = enc_out = None
        if self.encoder_type == "Multi":
            encoder = MultiScaleEncoder(
                middle_channels=self.N,
                out_channels=self.B,
                L1=self.L,
                L2=80,
                L3=160,
                name="encoder",
            )
            e, w1, w2, w3 = encoder(mix)
        else:
            if self.encoder_type == "Deep":
                encoder = DeepEncoder(self.N, self.L, self.L // 2, name="encoder")
                apply_enc = encoder
            else:
                conv = Conv1d(self.N, self.L, stride=self.L // 2, name="encoder")
                apply_enc = lambda w: nn.relu(conv(w[..., None]))  # noqa: E731
            ln_s = ChannelLayerNorm(name="ln_s")
            bottleneck = Conv1d(self.B, 1, name="bottleneck")
            enc_out = apply_enc(mix)
            e = bottleneck(ln_s(enc_out))

        if self.joint_training:
            if not self.spk_feat and self.feat_type == "consistent":
                if self.encoder_type == "Multi":
                    _, a1, a2, a3 = encoder(enroll)
                    aux = jnp.concatenate([a1, a2, a3], axis=-1)
                else:
                    aux = bottleneck(ln_s(apply_enc(enroll)))
                embed = SpExSpeakerEncoder(self.spk_emb_dim, name="spk_model")(
                    aux, train
                )
            else:
                raise NotImplementedError(
                    "external speaker models attach via models.speaker registry"
                )
            if self.multi_task:
                spk_logits = Dense(self.spks_in_train, name="pred_linear")(embed)
        else:
            embed = enroll  # pre-extracted embedding [B, E]

        if self.use_spk_transform:
            embed = SpeakerTransform(self.spk_emb_dim, name="spk_transform")(embed)

        # --- separator with per-repeat fusion ---------------------------------
        x = e
        # pad ONCE for the whole kernelized separator instead of a
        # pad + trim pair inside every block call (32 of each at the
        # SpEx+ envelope): pre-pad to a multiple of both kernel chunk
        # sizes and thread valid_len so the kernels mask the tail
        sep_valid = None
        if (
            self.multi_fuse
            and self.spk_fuse_type == "concatConv"
            and self.pallas_tcn
            and self.norm == "gLN"
            and not self.skip_con
            and _tcn_kernel_ok(x, self.H)
        ):
            from wesep_tpu.ops.pallas_tcn import _RC_BWD, _RC_FWD

            rc = max(_RC_FWD, _RC_BWD)
            if rc % min(_RC_FWD, _RC_BWD) == 0:
                t_sep = x.shape[1]
                p_len = -(-t_sep // rc) * rc
                if p_len != t_sep:
                    x = jnp.pad(x, ((0, 0), (0, p_len - t_sep), (0, 0)))
                sep_valid = t_sep
        if self.multi_fuse:
            for r in range(self.R):
                if self.spk_fuse_type == "concatConv":
                    x = FuseTCNBlock(
                        conv_channels=self.H,
                        kernel_size=self.P,
                        norm=self.norm,
                        causal=self.causal,
                        fuse_gln=self.fuse_gln,
                        pallas_tcn=self.pallas_tcn,
                        valid_len=sep_valid,
                        name=f"fuse_{r}",
                    )(x, embed)
                    x = TCNStack(
                        R=1,
                        X=self.X,
                        conv_channels=self.H,
                        kernel_size=self.P,
                        norm=self.norm,
                        causal=self.causal,
                        skip_con=self.skip_con,
                        start_dilation=1,
                        remat=self.remat,
                        fuse_gln=self.fuse_gln,
                        pallas_tcn=self.pallas_tcn,
                        valid_len=sep_valid,
                        name=f"tcn_{r}",
                    )(x)
                else:
                    x = SpeakerFuse(self.B, self.spk_fuse_type, name=f"fuse_{r}")(
                        x, embed
                    )
                    x = PReLU(name=f"fuse_act_{r}")(x)
                    x = get_norm(self.norm)(x)
                    x = TCNStack(
                        R=1,
                        X=self.X,
                        conv_channels=self.H,
                        kernel_size=self.P,
                        norm=self.norm,
                        causal=self.causal,
                        skip_con=self.skip_con,
                        remat=self.remat,
                        fuse_gln=self.fuse_gln,
                        pallas_tcn=self.pallas_tcn,
                        name=f"tcn_{r}",
                    )(x)
        else:
            if self.spk_fuse_type == "concatConv":
                x = FuseTCNBlock(
                    conv_channels=self.H,
                    kernel_size=self.P,
                    norm=self.norm,
                    causal=self.causal,
                    fuse_gln=self.fuse_gln,
                    name="fuse_0",
                )(x, embed)
            else:
                x = SpeakerFuse(self.B, self.spk_fuse_type, name="fuse_0")(x, embed)
                x = PReLU(name="fuse_act_0")(x)
                x = get_norm(self.norm)(x)
            x = TCNStack(
                R=self.R,
                X=self.X,
                conv_channels=self.H,
                kernel_size=self.P,
                norm=self.norm,
                causal=self.causal,
                skip_con=self.skip_con,
                remat=self.remat,
                fuse_gln=self.fuse_gln,
                name="tcn",
            )(x)

        if sep_valid is not None:
            x = x[:, :sep_valid]  # drop the pad-once tail

        # --- decoder ----------------------------------------------------------
        t_len = mix.shape[-1]
        if self.decoder_type == "Multi":
            stride = self.L // 2
            ests = []
            for i, (w, k) in enumerate(((w1, self.L), (w2, 80), (w3, 160))):
                m = self._activation(Conv1d(self.N, 1, name=f"mask_{i}")(x))
                s = ConvTranspose1d(1, k, stride, name=f"dec_{i}")(w * m)[..., 0]
                ests.append(s[..., :t_len])
            # est2/est3 trimmed to est1's length (decoder.py:100-110)
            min_len = min(e_.shape[-1] for e_ in ests)
            est = [e_[..., :min_len] for e_ in ests]
        else:
            m = self._activation(Conv1d(self.N, 1, name="gen_masks")(x))
            # single-scale path masks the raw encoder output (N channels)
            masked = (w1 if self.encoder_type == "Multi" else enc_out) * m
            est = ConvTranspose1d(1, self.L, self.L // 2, name="dec")(masked)[
                ..., 0
            ][..., :t_len]

        return est, spk_logits
