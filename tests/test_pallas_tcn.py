"""Exact parity for the fused Pallas TCN block (ops/pallas_tcn.py).

Runs the kernel in interpret mode on the CPU harness (same code path
as the TPU kernel modulo Mosaic lowering) against a straight-line jnp
reference of the gLN TCN block
(/root/reference/wesep/modules/tasnet/convs.py:43-104 semantics: 1x1 ->
PReLU -> gLN -> zero-padded depthwise dilated conv -> PReLU -> gLN ->
1x1, residual). Covers forward + every gradient, odd (non-chunk-
multiple) T, dilations spanning the SpEx+ stack (1..128 at model scale
is exercised on-chip; here small shapes keep interpret fast), causal
padding, and the model-level route (WESEP_TCN_PALLAS=force) including
the FuseTCNBlock embedding fold.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.ops.pallas_tcn import tcn_block_gln


def ref_block(x, b1e, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
              d, k, causal, eps=1e-5):
    s = jnp.einsum("btc,ch->bth", x, w1) + b1e[:, None, :]
    u = jnp.where(s >= 0, s, p0 * s)
    mu = u.mean(axis=(1, 2), keepdims=True)
    var = ((u - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    n0 = g0w * (u - mu) * jax.lax.rsqrt(var + eps) + g0b
    pad = (d * (k - 1), 0) if causal else (d * (k - 1) // 2,) * 2
    n0p = jnp.pad(n0, ((0, 0), pad, (0, 0)))
    v = sum(
        kd[kk] * n0p[:, kk * d : kk * d + x.shape[1]] for kk in range(k)
    ) + bd
    w = jnp.where(v >= 0, v, p1 * v)
    mu1 = w.mean(axis=(1, 2), keepdims=True)
    var1 = ((w - mu1) ** 2).mean(axis=(1, 2), keepdims=True)
    n1 = g1w * (w - mu1) * jax.lax.rsqrt(var1 + eps) + g1b
    return x + jnp.einsum("bth,hc->btc", n1, w2) + b2


def _args(rng, b, t, c, h, k):
    f32 = jnp.float32
    return [
        jnp.asarray(rng.standard_normal((b, t, c)), f32) * 0.5,
        jnp.asarray(rng.standard_normal((b, h)), f32) * 0.1,
        jnp.asarray(rng.standard_normal((c, h)) * 0.08, f32),
        jnp.float32(0.25),
        jnp.asarray(rng.standard_normal((k, h)) * 0.3, f32),
        jnp.asarray(rng.standard_normal((h,)) * 0.1, f32),
        jnp.asarray(rng.uniform(0.5, 1.5, h), f32),
        jnp.asarray(rng.standard_normal(h) * 0.2, f32),
        jnp.float32(0.25),
        jnp.asarray(rng.standard_normal((h, c)) * 0.08, f32),
        jnp.asarray(rng.standard_normal((c,)) * 0.1, f32),
        jnp.asarray(rng.uniform(0.5, 1.5, h), f32),
        jnp.asarray(rng.standard_normal(h) * 0.2, f32),
    ]


@pytest.mark.parametrize(
    "d,causal,t",
    [(1, False, 700), (4, False, 700), (16, False, 513),
     (4, True, 700), (64, False, 1024)],
)
def test_forward_parity(d, causal, t):
    rng = np.random.default_rng(d)
    args = _args(rng, 2, t, 64, 128, 3)
    want = np.asarray(ref_block(*args, d, 3, causal))
    got = np.asarray(tcn_block_gln(*args, d, 3, causal, 1e-5))
    np.testing.assert_allclose(
        got, want, atol=2e-4 * np.abs(want).max(), rtol=0
    )


@pytest.mark.parametrize("d,causal", [(1, False), (16, False), (4, True)])
def test_grad_parity(d, causal):
    rng = np.random.default_rng(100 + d)
    args = _args(rng, 2, 700, 64, 128, 3)
    tgt = jnp.asarray(rng.standard_normal((2, 700, 64)), jnp.float32)

    def loss(fn, *a):
        return jnp.sum((fn(*a) - tgt) ** 2)

    gr = jax.grad(
        lambda *a: loss(lambda *b: ref_block(*b, d, 3, causal), *a),
        argnums=tuple(range(13)),
    )(*args)
    gk = jax.grad(
        lambda *a: loss(
            lambda *b: tcn_block_gln(*b, d, 3, causal, 1e-5), *a
        ),
        argnums=tuple(range(13)),
    )(*args)
    names = "x b1e w1 p0 kd bd g0w g0b p1 w2 b2 g1w g1b".split()
    for nm, a, b_ in zip(names, gr, gk):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=2e-4 * scale, rtol=0,
            err_msg=nm,
        )


def test_model_route_parity(monkeypatch):
    """ConvTasNet with WESEP_TCN_PALLAS=force matches the XLA path and
    keeps the identical param tree (checkpoint compatibility), incl.
    the FuseTCNBlock embedding fold (concatConv fusion)."""
    from wesep_tpu.models import get_model

    args = dict(L=20, N=32, X=3, R=2, B=32, H=64, P=3, norm="gLN",
                causal=False, skip_con=False, spk_emb_dim=16,
                spk_fuse_type="concatConv", encoder_type="Multi",
                decoder_type="Multi", joint_training=False)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32) * 0.1
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    m = get_model("ConvTasNet")(**args)
    monkeypatch.setenv("WESEP_TCN_PALLAS", "force")
    v = m.init(jax.random.PRNGKey(0), mix, emb, train=False)
    ests_k = m.apply(v, mix, emb, train=False)[0]
    monkeypatch.setenv("WESEP_TCN_PALLAS", "0")
    v2 = m.init(jax.random.PRNGKey(0), mix, emb, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v2
    )
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ests_x = m.apply(v, mix, emb, train=False)[0]
    for a, b in zip(ests_k, ests_x):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4 * scale, rtol=0
        )


def test_model_route_grads(monkeypatch):
    """Gradients through the routed model (incl. d_embed through the
    b1_eff fold) match the XLA path."""
    from wesep_tpu.models import get_model

    args = dict(L=20, N=32, X=2, R=1, B=32, H=64, P=3, norm="gLN",
                causal=False, skip_con=False, spk_emb_dim=16,
                spk_fuse_type="concatConv", encoder_type="Multi",
                decoder_type="Multi", joint_training=False)
    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.standard_normal((2, 6000)), jnp.float32) * 0.1
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    m = get_model("ConvTasNet")(**args)
    monkeypatch.setenv("WESEP_TCN_PALLAS", "0")
    v = m.init(jax.random.PRNGKey(0), mix, emb, train=False)

    def loss(v, emb):
        ests = m.apply(v, mix, emb, train=False)[0]
        return sum(jnp.sum(e**2) for e in ests)

    g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(v, emb)
    monkeypatch.setenv("WESEP_TCN_PALLAS", "force")
    g_k = jax.jit(jax.grad(loss, argnums=(0, 1)))(v, emb)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_k)):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4 * scale, rtol=0
        )
