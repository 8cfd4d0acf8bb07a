"""Utterance-level pooling layers: TSTP / ASTP / MQMHASTP.

Equivalents of wespeaker's pooling_layers (selected by `pooling_func` in the
recipe spk_args, examples/librimix/tse/v2/confs/bsrnn.yaml:61-78). Input is
frame-level features [B, T, D] (channels last); output [B, out_dim].
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["TSTP", "ASTP", "MQMHASTP", "get_pooling"]


class TSTP(nn.Module):
    """Temporal statistics pooling: concat(mean, std) -> [B, 2D].

    wespeaker-exact: std = sqrt(UNBIASED var + 1e-7) (torch.var's default
    correction; wespeaker pooling_layers.TSTP)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1)
        std = jnp.sqrt(jnp.var(xf, axis=1, ddof=1) + 1e-7)
        return jnp.concatenate([mean, std], axis=-1).astype(x.dtype)


class ASTP(nn.Module):
    """Attentive statistics pooling, wespeaker-exact (same numerics as
    ecapa_ws._ASTP_WS): global context uses per-channel mean and UNBIASED
    std over time (+1e-10); attention projections named linear1/linear2
    (1x1 convs in wespeaker, Dense on this channels-last layout);
    weighted std clamped at 1e-10 before the sqrt. wespeaker's default
    for non-GLOB models is global_context_att=False.
    """

    bottleneck_dim: int = 128
    global_context: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, d = x.shape
        xf = x.astype(jnp.float32)
        if self.global_context:
            mean = jnp.mean(xf, axis=1, keepdims=True)
            std = jnp.sqrt(
                jnp.var(xf, axis=1, keepdims=True, ddof=1) + 1e-10
            )
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


class MQMHASTP(nn.Module):
    """Multi-query multi-head ASTP: independent ASTP heads on channel
    splits, concatenated (wespeaker MQMHASTP, simplified to q=2, h=2)."""

    n_heads: int = 4
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = x.shape[-1]
        assert d % self.n_heads == 0
        chunk = d // self.n_heads
        outs = []
        for h in range(self.n_heads):
            xh = x[..., h * chunk : (h + 1) * chunk]
            outs.append(
                ASTP(self.bottleneck_dim, name=f"head_{h}")(xh, train)
            )
        return jnp.concatenate(outs, axis=-1)


_POOL = {"TSTP": TSTP, "ASTP": ASTP, "MQMHASTP": MQMHASTP}


def get_pooling(name: str):
    if name not in _POOL:
        raise ValueError(f"unknown pooling {name!r}; have {sorted(_POOL)}")
    return _POOL[name]


def pooling_out_mult(name: str) -> int:
    """Output dim multiplier vs input dim."""
    return {"TSTP": 2, "ASTP": 2, "MQMHASTP": 2}[name]
