"""Utterance-level pooling layers: TSTP / ASTP / MQMHASTP.

Equivalents of wespeaker's pooling_layers (selected by `pooling_func` in the
recipe spk_args, examples/librimix/tse/v2/confs/bsrnn.yaml:61-78). Input is
frame-level features [B, T, D] (channels last); output [B, out_dim].
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["TSTP", "ASTP", "MQMHASTP", "get_pooling"]


def _stats(x, weights=None, eps=1e-7):
    """Weighted mean/std over the time axis of [B, T, D]."""
    if weights is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.mean(jnp.square(x), axis=1) - jnp.square(mean)
    else:
        mean = jnp.sum(weights * x, axis=1)
        var = jnp.sum(weights * jnp.square(x), axis=1) - jnp.square(mean)
    std = jnp.sqrt(jnp.clip(var, min=eps))
    return mean, std


class TSTP(nn.Module):
    """Temporal statistics pooling: concat(mean, std) -> [B, 2D]."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        mean, std = _stats(x.astype(jnp.float32))
        return jnp.concatenate([mean, std], axis=-1).astype(x.dtype)


class ASTP(nn.Module):
    """Attentive statistics pooling (ECAPA-style), optionally with global
    context: attention input is [x, mean(x), std(x)] tiled over time.
    """

    bottleneck_dim: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, d = x.shape
        if self.global_context:
            mean, std = _stats(x.astype(jnp.float32))
            ctx = jnp.concatenate([mean, std], axis=-1).astype(x.dtype)
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(ctx[:, None, :], (b, t, 2 * d))], axis=-1
            )
        else:
            attn_in = x
        a = nn.Dense(self.bottleneck_dim, name="att1")(attn_in)
        a = jnp.tanh(a)
        a = nn.Dense(d, name="att2")(a)
        w = nn.softmax(a.astype(jnp.float32), axis=1)
        mean, std = _stats(x.astype(jnp.float32), w)
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
