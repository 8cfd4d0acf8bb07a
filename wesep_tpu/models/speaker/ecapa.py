"""ECAPA-TDNN speaker encoder (arXiv:2005.07143), channels-last TPU layout.

Equivalent of wespeaker's ecapa_tdnn.py consumed by the reference configs
(spk_model 'ECAPA_TDNN_GLOB_c512', embed 192, ASTP pooling —
examples/librimix/tse/v2/confs/bsrnn.yaml:64-69). All convs are 1-D NWC;
Res2Net splits stay on the lane dim.

Topology: conv5(F->C) + relu + BN; 3x SE-Res2Block (kernel 3, dilations
2/3/4, scale 8, SE bottleneck 128); concat the 3 block outputs ->
conv1(3C->1536) + relu; ASTP (global-context for _GLOB_ names) -> BN ->
linear -> embedding.
"""

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.common import Conv1d
from wesep_tpu.models.speaker.pooling import ASTP

__all__ = ["ECAPA_TDNN", "make_ecapa"]


class SEBlock(nn.Module):
    """Squeeze-excitation over channels of [B, T, C]."""

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1)  # [B, C]
        s = nn.relu(nn.Dense(self.bottleneck, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], name="fc2")(s))
        return x * s[:, None, :]


class Res2Conv(nn.Module):
    """Res2Net hierarchical conv: split C into `scale` groups; each group
    (after the first) is conv3'd with the previous group's output added."""

    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        assert c % self.scale == 0
        width = c // self.scale
        pad = self.dilation * (self.kernel_size - 1) // 2
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if y is None else chunks[i] + y
            y = Conv1d(
                width,
                self.kernel_size,
                dilation=self.dilation,
                padding=pad,
                name=f"conv_{i}",
            )(inp)
            y = nn.relu(y)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class SERes2Block(nn.Module):
    """conv1 -> relu -> BN -> Res2Conv -> relu -> BN -> conv1 -> relu -> BN
    -> SE, residual."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = Conv1d(self.channels, 1, name="conv_in")(x)
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_in")(y).astype(y.dtype)
        y = Res2Conv(self.kernel_size, self.dilation, self.scale,
                     name="res2")(y)
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_mid")(y).astype(y.dtype)
        y = Conv1d(self.channels, 1, name="conv_out")(y)
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_out")(y).astype(y.dtype)
        y = SEBlock(name="se")(y)
        return y + residual


class ECAPA_TDNN(nn.Module):
    channels: int = 512
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True,
                 return_frame_feats: bool = False):
        """feats: [B, T, F_mel] -> embedding [B, embed_dim].

        return_frame_feats=True instead returns the frame-level features
        [B, T, channels] before aggregation (the `_get_frame_level_feat`
        hook BSRNN_Feats' cross-attention fusion consumes —
        /root/reference/wesep/models/bsrnn_feats.py:532-534).
        """
        x = Conv1d(self.channels, 5, padding=2, name="layer1")(feats)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x).astype(x.dtype)
        outs = []
        for i, dil in enumerate((2, 3, 4)):
            x = SERes2Block(
                self.channels, 3, dil, 8, name=f"layer{i + 2}"
            )(x, train)
            outs.append(x)
        if return_frame_feats:
            return outs[-1]  # [B, T, channels]
        cat = jnp.concatenate(outs, axis=-1)
        x = Conv1d(1536, 1, name="conv_agg")(cat)
        x = nn.relu(x)
        pooled = ASTP(
            bottleneck_dim=128,
            global_context=self.global_context_att,
            name="pool",
        )(x, train)
        pooled = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            use_scale=True, use_bias=True, name="pool_bn",
        )(pooled).astype(pooled.dtype)
        return nn.Dense(self.embed_dim, name="linear")(pooled)


def make_ecapa(name: str):
    """'ECAPA_TDNN_c512' / 'ECAPA_TDNN_GLOB_c1024' etc. -> constructor.

    The constructor accepts `layout`: 'tpu' (default, this module's faster
    native encoder) or 'wespeaker' (bit-exact wespeaker micro-structure for
    porting jointly-trained reference checkpoints — see ecapa_ws.py).
    """
    glob = "_GLOB" in name
    channels = int(name.rsplit("c", 1)[-1])

    def ctor(embed_dim: int = 192, pooling_func: str = "ASTP",
             layout: str = "tpu", emb_bn: bool = False,
             name=None, **_ignored):
        if layout == "wespeaker":
            from wesep_tpu.models.speaker.ecapa_ws import ECAPA_TDNN_WS

            return ECAPA_TDNN_WS(
                channels=channels,
                embed_dim=embed_dim,
                pooling_func=pooling_func,
                global_context_att=glob,
                emb_bn=emb_bn,
                name=name,
            )
        if layout != "tpu":
            raise ValueError(
                f"unknown ECAPA layout {layout!r}; use 'tpu' or 'wespeaker'"
            )
        return ECAPA_TDNN(
            channels=channels,
            embed_dim=embed_dim,
            pooling_func=pooling_func,
            global_context_att=glob,
            name=name,
        )

    return ctor
