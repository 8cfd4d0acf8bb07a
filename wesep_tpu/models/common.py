"""Shared building blocks: norms, FiLM, speaker transform/fusion, LSTM module.

Re-designs of /root/reference/wesep/modules/common/{norm,speaker}.py for
channels-LAST layouts ([B, T, C] / [B, T, F, C]) so the channel dim sits on
the TPU lane dimension. Fuse semantics (concat/additive/multiply/FiLM) match
the reference exactly.
"""

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wesep_tpu.ops.init import torch_linear_init

__all__ = [
    "GlobalLayerNorm",
    "ChannelLayerNorm",
    "get_norm",
    "FiLM",
    "PReLU",
    "SpeakerTransform",
    "SpeakerFuse",
    "Dense",
    "Conv1d",
]


class Dense(nn.Module):
    """Linear layer with torch-default init (U(-1/sqrt(in), 1/sqrt(in)))."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        init = torch_linear_init(fan_in)
        kernel = self.param("kernel", init, (fan_in, self.features))
        # compute in the INPUT dtype (bf16 under mixed precision): without
        # the kernel cast, jnp promotes bf16 x against the f32 param and
        # the matmul runs f32 (params are stored f32 by design)
        y = jnp.matmul(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", init, (self.features,))
            y = y + bias
        return y.astype(x.dtype)


class Conv1d(nn.Module):
    """1-D conv on [B, T, C] with torch-default init.

    Wraps flax Conv (NWC layout) but initializes like torch nn.Conv1d so
    training dynamics match the reference configs. DEPTHWISE convs
    (groups == in == out channels, stride 1) are lowered as k shifted
    multiply-adds on the VPU instead of a grouped convolution — XLA's
    grouped-conv lowering is catastrophically slow on TPU (measured >20x
    on the SpEx+ TCN); param shapes stay identical to nn.Conv
    ('kernel' [k, 1, C], 'bias' [C]) so weight maps are unchanged.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: str | int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = self.kernel_size * (in_ch // self.groups)
        init = torch_linear_init(fan_in)
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)]
        else:
            padding = self.padding
        depthwise = (
            self.groups == in_ch
            and self.features == in_ch
            and self.stride == 1
            and self.kernel_size <= 8
            and not isinstance(padding, str)
        )
        if depthwise:
            kernel = self.param(
                "kernel", init, (self.kernel_size, 1, self.features)
            )
            # keep the chain in the input dtype: f32 params would promote
            # the whole [B, T, C] stream (and its adjoints) to f32
            kernel = kernel.astype(x.dtype)
            pad_lo, pad_hi = padding[0]
            xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
            t_out = xp.shape[1] - self.dilation * (self.kernel_size - 1)
            y = None
            for k in range(self.kernel_size):
                tap = jax.lax.dynamic_slice_in_dim(
                    xp, k * self.dilation, t_out, axis=1
                )
                term = tap * kernel[k, 0]
                y = term if y is None else y + term
            if self.use_bias:
                bias = self.param("bias", init, (self.features,))
                y = y + bias.astype(x.dtype)
            return y
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=init,
            bias_init=init,
            # computation dtype = input dtype; flax would otherwise
            # promote against the f32 params and run the conv in f32
            dtype=x.dtype,
        )(x)


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over ALL non-batch dims, per-channel affine.

    Equivalent to the reference GlobalChannelLayerNorm
    (/root/reference/wesep/modules/common/norm.py:7-48) and to
    nn.GroupNorm(1, C) on [B, C, T]. Input here is [B, ..., C].
    """

    eps: float = 1e-5
    # return the per-(batch, channel) affine (a, c) with gLN(x) = a*x + c
    # instead of the normalized tensor. Since a and c are constant over
    # time, callers can commute the affine past any per-channel linear
    # op (depthwise conv, 1x1 conv) — the fused TCN path uses this to
    # break the global-stats -> conv serialization (BASELINE.md SpEx+
    # HBM-traffic analysis). Same params, same name sequence.
    return_affine: bool = False

    @nn.compact
    def __call__(self, x):
        # Precision note (ADVICE r4): under bf16 compute the squares are
        # formed from bf16-rounded values and the affine applies in bf16,
        # so a stream with |mean| >> std (not the case for zero-mean
        # audio activations; validated by the on-chip convergence
        # battery) loses precision vs an f32 upcast. Escape hatch:
        # WESEP_GLN_F32=1 restores full-f32 stats + application at the
        # cost of an f32 adjoint stream (the r4 throughput regression).
        in_dtype = x.dtype
        if os.environ.get("WESEP_GLN_F32") == "1":
            x = x.astype(jnp.float32)
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(1, x.ndim))
        # single-pass stats: E[x^2]-E[x]^2 lets XLA fuse both sums into
        # ONE read of x instead of the two serialized passes of the
        # centered form — the gLN stats reductions are ~49% of the SpEx+
        # step (xplane attribution, BASELINE.md). The squares stay in
        # the COMPUTE dtype (their adjoint is a full [B, T, C] stream —
        # an x.astype(f32) upcast would put that stream in f32, r4
        # xplane finding) while the reductions accumulate in f32, which
        # keeps the cancellation error small at activation scales.
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        meansq = jnp.mean(
            jnp.square(x), axis=axes, keepdims=True, dtype=jnp.float32
        )
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        scale = jax.lax.rsqrt(var + self.eps)
        if self.return_affine:
            a = weight * scale  # [B, 1.., C]
            caff = bias - mean * weight * scale
            return a, caff
        # apply as an affine of x in the compute dtype (keeps the big
        # stream and its adjoint out of f32; exact for f32 inputs)
        a = (weight * scale).astype(x.dtype)
        caff = (bias - mean * weight * scale).astype(x.dtype)
        return (a * x + caff).astype(in_dtype)


class ChannelLayerNorm(nn.Module):
    """cLN: LayerNorm over the channel (last) dim only, per (B, T) position."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # stats/affine run f32 (flax promotes against the f32 params —
        # good for accuracy); cast back so ONE encoder norm does not
        # poison the whole downstream network to f32 under bf16 compute
        # (r4 finding: the entire SpEx+ TCN ran f32 because of this)
        return nn.LayerNorm(epsilon=self.eps)(x).astype(x.dtype)


class BatchNorm1d(nn.Module):
    """BatchNorm over (B, T) per channel; uses running stats at eval."""

    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = True):
        # cast back: flax BatchNorm promotes bf16 x against its f32
        # params/stats and returns f32, which would silently run the
        # whole downstream speaker branch in f32 under mixed precision
        # (the r4/r5 promotion-bug class); stats still accumulate f32
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=None,
        )(x).astype(x.dtype)


def get_norm(kind: str, eps: float = 1e-5, name: str = None):
    """cLN / gLN / BN selector (reference select_norm, norm.py:69-81)."""
    if kind == "cLN":
        return ChannelLayerNorm(eps=eps, name=name)
    if kind == "gLN":
        return GlobalLayerNorm(eps=eps, name=name)
    if kind == "BN":
        return BatchNorm1d(eps=eps, name=name)
    raise ValueError(f"Unsupported norm: {kind}")


def norm_auto_name(kind: str, idx: int) -> str:
    """The flax auto-assigned name get_norm's module historically got at
    position `idx` — for call sites that must create norm modules on
    divergent code paths without shifting the checkpoint param tree."""
    cls = {"cLN": "ChannelLayerNorm", "gLN": "GlobalLayerNorm",
           "BN": "BatchNorm1d"}[kind]
    return f"{cls}_{idx}"


class PReLU(nn.Module):
    """PReLU with a single shared slope, init 0.25 (torch default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, self.init), (1,)
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class FiLM(nn.Module):
    """Feature-wise linear modulation, zero-initialized to identity.

    (1 + gamma(e)) * x + beta(e); gamma/beta MLPs start at exactly zero
    (reference FiLM.init_weights, norm.py:110-116).
    """

    feat_dim: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, embed, x):
        gamma, beta = embed, embed
        for i in range(self.num_layers):
            zero = nn.initializers.zeros
            gamma = nn.Dense(self.feat_dim, kernel_init=zero, bias_init=zero,
                             name=f"gamma_{i}")(gamma)
            beta = nn.Dense(self.feat_dim, kernel_init=zero, bias_init=zero,
                            name=f"beta_{i}")(beta)
        # embed: [B, E] -> broadcast over x [B, ..., C]
        while gamma.ndim < x.ndim:
            gamma = gamma[:, None]
            beta = beta[:, None]
        return (1.0 + gamma) * x + beta


class SpeakerTransform(nn.Module):
    """3-layer pointwise MLP on the embedding, keeps dimension.

    Reference: /root/reference/wesep/modules/common/speaker.py:26-49
    (Conv1d(E,hid,1) -> [Conv1d(hid,hid,1), Tanh] -> Conv1d(hid,E,1)).
    """

    embed_dim: int = 256
    num_layers: int = 3
    hid_dim: int = 128

    @nn.compact
    def __call__(self, e):
        y = Dense(self.hid_dim)(e)
        for _ in range(self.num_layers - 2):
            y = jnp.tanh(Dense(self.hid_dim)(y))
        return Dense(self.embed_dim)(y)


class SpeakerFuse(nn.Module):
    """Fuse a speaker embedding [B, E] into features [B, ..., C].

    fuse_type: concat | additive | multiply | FiLM
    (reference SpeakerFuseLayer, speaker.py:63-125). Works for both the 3-D
    [B, T, C] and 4-D [B, nband, T, C] layouts — the embedding broadcasts
    across all middle dims.
    """

    feat_dim: int
    fuse_type: str = "concat"

    @nn.compact
    def __call__(self, x, embed):
        ft = self.fuse_type
        if ft == "None":
            return x
        if ft == "FiLM":
            return FiLM(self.feat_dim)(embed, x)
        e = embed
        while e.ndim < x.ndim:
            e = jnp.expand_dims(e, 1)
        if ft == "concat":
            tile = jnp.broadcast_to(e, x.shape[:-1] + (embed.shape[-1],))
            return Dense(self.feat_dim)(jnp.concatenate([x, tile], axis=-1))
        proj = Dense(self.feat_dim)(e)
        if ft == "additive":
            return x + proj
        if ft == "multiply":
            return x * proj
        raise ValueError(f"Fuse type not defined: {ft}")


class LSTM(nn.Module):
    """LSTM flax module over [B, T, D] built on the fused scan kernel.

    bidirectional=True concatenates forward/backward -> [B, T, 2H].
    Init matches torch nn.LSTM (U(-1/sqrt(H), 1/sqrt(H))).

    unfold_ks > 0: the input is the RAW [B, L, C] stream and the module
    computes unfold(unfold_ks, unfold_hs) -> BiLSTM with the SAME param
    tree as feeding the pre-unfolded [B, T', C*ks] stream (wx stays
    [ks*C, 4H] in torch F.unfold channel-major order, so checkpoints
    and torch ports are unchanged). On TPU the unfolded stream never
    materializes (ops/pallas_lstm.bilstm_layer_unfold).
    """

    hidden: int
    bidirectional: bool = True
    unfold_ks: int = 0
    unfold_hs: int = 1

    @nn.compact
    def __call__(self, x):
        from wesep_tpu.ops.init import torch_lstm_init
        from wesep_tpu.ops.rnn import bilstm, bilstm_unfold, lstm

        d = x.shape[-1]
        if self.unfold_ks:
            d = d * self.unfold_ks
        init = torch_lstm_init(self.hidden)
        wx_f = self.param("wx_f", init, (d, 4 * self.hidden))
        wh_f = self.param("wh_f", init, (self.hidden, 4 * self.hidden))
        b_f = self.param("b_f", init, (4 * self.hidden,))
        if not self.bidirectional:
            if self.unfold_ks:
                raise NotImplementedError(
                    "unfold_ks requires bidirectional=True"
                )
            return lstm(x, wx_f, wh_f, b_f)
        wx_b = self.param("wx_b", init, (d, 4 * self.hidden))
        wh_b = self.param("wh_b", init, (self.hidden, 4 * self.hidden))
        b_b = self.param("b_b", init, (4 * self.hidden,))
        if self.unfold_ks:
            return bilstm_unfold(x, wx_f, wh_f, b_f, wx_b, wh_b, b_b,
                                 self.unfold_ks, self.unfold_hs)
        return bilstm(x, wx_f, wh_f, b_f, wx_b, wh_b, b_b)


def preemphasis(wav: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """Reflect-padded pre-emphasis filter [-coef, 1] (PreEmphasis module)."""
    first = wav[..., 1:2]
    padded = jnp.concatenate([first, wav], axis=-1)
    return padded[..., 1:] - coef * padded[..., :-1]
