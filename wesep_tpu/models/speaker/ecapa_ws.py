"""Wespeaker-layout ECAPA-TDNN: exact micro-structure parity for porting
jointly-trained reference checkpoints.

The reference's joint models embed an encoder from the external wespeaker
package (`from wespeaker.models.speaker_model import get_speaker_model`,
/root/reference/wesep/models/bsrnn.py:9,217), so released joint checkpoints
(e.g. the hub's bsrnn_ecapa_vox1) carry wespeaker's ECAPA weights. That
implementation (wespeaker/models/ecapa_tdnn.py, Apache-2.0, itself after
github.com/lawlict/ECAPA-TDNN) differs from our TPU-idiomatic
`ecapa.ECAPA_TDNN` in micro-structure:

  * Res2 stage: `scale - 1` convs (the LAST raw split is passed through and
    concatenated at the END), each conv followed by relu THEN a per-split
    BatchNorm — vs our `scale - 1` convs on splits 1.., raw FIRST split,
    relu only, one aggregate BN outside.
  * Block: conv1-relu-bn -> res2 (BNs inside) -> conv1-relu-bn -> SE,
    + residual — no extra relu/BN around the res2 stage.
  * ASTP global context: per-channel mean and UNBIASED std over time
    (torch.var default), eps 1e-10, attention projections as 1x1 convs.
  * Frame-level features (`_get_frame_level_feat`) are the post-`conv`
    relu'd concat features (3*channels wide), not a block output.

This module reproduces that graph exactly (channels-last NWC) so
`utils/torch_port.port_wespeaker_ecapa_state_dict` can map a wespeaker
state_dict bit-for-bit. Select it with `spk_args: {layout: wespeaker}` in a
recipe config; the default `layout: tpu` keeps the faster native encoder.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.common import Conv1d

__all__ = ["ECAPA_TDNN_WS"]


class _ConvReluBn(nn.Module):
    """wespeaker Conv1dReluBn: conv -> relu -> BatchNorm1d."""

    channels: int
    kernel_size: int = 1
    dilation: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv1d(
            self.channels,
            self.kernel_size,
            dilation=self.dilation,
            padding=self.padding,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(nn.relu(y))


class _Res2ConvReluBn(nn.Module):
    """wespeaker Res2Conv1dReluBn: scale-1 convs over channel splits.

    Split i (i >= 1) is added to the PREVIOUS conv-relu-bn output before
    its own conv; the last raw split is appended unprocessed at the END of
    the concat (vs the first at the start in our native Res2Conv).
    """

    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        assert c % self.scale == 0, (c, self.scale)
        width = c // self.scale
        pad = self.dilation * (self.kernel_size - 1) // 2
        nums = self.scale if self.scale == 1 else self.scale - 1
        spx = jnp.split(x, self.scale, axis=-1)
        outs = []
        sp = spx[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + spx[i]
            sp = Conv1d(
                width,
                self.kernel_size,
                dilation=self.dilation,
                padding=pad,
                name=f"convs_{i}",
            )(sp)
            sp = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bns_{i}",
            )(nn.relu(sp))
            outs.append(sp)
        if self.scale != 1:
            outs.append(spx[self.scale - 1])
        return jnp.concatenate(outs, axis=-1)


class _SEConnect(nn.Module):
    """wespeaker SE_Connect: time-mean -> linear-relu -> linear-sigmoid."""

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1)
        s = nn.relu(nn.Dense(self.bottleneck, name="linear1")(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], name="linear2")(s))
        return x * s[:, None, :]


class _SERes2Block(nn.Module):
    """wespeaker SE_Res2Block: x + SE(CRB1(Res2(CRB0(x))))."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = _ConvReluBn(self.channels, 1, name="conv_in")(x, train)
        y = _Res2ConvReluBn(
            self.kernel_size, self.dilation, self.scale, name="res2"
        )(y, train)
        y = _ConvReluBn(self.channels, 1, name="conv_out")(y, train)
        y = _SEConnect(name="se")(y)
        return x + y


class _ASTP_WS(nn.Module):
    """wespeaker ASTP, exactly: global context uses per-channel mean and
    UNBIASED std over time (+1e-10); attention projections are 1x1 convs
    (mapped here to Dense on the channels-last layout); weighted std is
    clamped at 1e-10 before the sqrt."""

    bottleneck_dim: int = 128
    global_context: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, d = x.shape
        xf = x.astype(jnp.float32)
        if self.global_context:
            mean = jnp.mean(xf, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.var(xf, axis=1, keepdims=True, ddof=1) + 1e-10)
            attn_in = jnp.concatenate(
                [
                    xf,
                    jnp.broadcast_to(mean, (b, t, d)),
                    jnp.broadcast_to(std, (b, t, d)),
                ],
                axis=-1,
            )
        else:
            attn_in = xf
        a = jnp.tanh(nn.Dense(self.bottleneck_dim, name="linear1")(attn_in))
        a = nn.Dense(d, name="linear2")(a)
        w = nn.softmax(a.astype(jnp.float32), axis=1)
        mean = jnp.sum(w * xf, axis=1)
        var = jnp.sum(w * jnp.square(xf), axis=1) - jnp.square(mean)
        std = jnp.sqrt(jnp.clip(var, min=1e-10))
        return jnp.concatenate([mean, std], axis=-1).astype(x.dtype)


class ECAPA_TDNN_WS(nn.Module):
    """wespeaker-layout ECAPA-TDNN (channels-last).

    feats [B, T, F_mel] -> embedding [B, embed_dim];
    return_frame_feats=True -> post-conv frame features [B, T, 3*channels]
    (what the reference's cross-attention fusion consumes via
    `spk_model._get_frame_level_feat`, bsrnn_feats.py:533).
    """

    channels: int = 512
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = False
    emb_bn: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = True,
                 return_frame_feats: bool = False):
        if self.pooling_func != "ASTP":
            raise NotImplementedError(
                "wespeaker-layout ECAPA supports ASTP pooling only "
                f"(got {self.pooling_func!r}); the reference joint configs "
                "all use ASTP"
            )
        x = _ConvReluBn(self.channels, 5, padding=2, name="layer1")(
            feats, train
        )
        outs = []
        for i, dil in enumerate((2, 3, 4)):
            x = _SERes2Block(
                self.channels, 3, dil, 8, name=f"layer{i + 2}"
            )(x, train)
            outs.append(x)
        cat = jnp.concatenate(outs, axis=-1)
        cat_ch = 3 * self.channels
        out = nn.relu(Conv1d(cat_ch, 1, name="conv")(cat))
        if return_frame_feats:
            return out
        pooled = _ASTP_WS(
            bottleneck_dim=128,
            global_context=self.global_context_att,
            name="pool",
        )(out, train)
        pooled = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(pooled).astype(pooled.dtype)
        emb = nn.Dense(self.embed_dim, name="linear")(pooled)
        if self.emb_bn:
            emb = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn2",
            )(emb).astype(emb.dtype)
        return emb
