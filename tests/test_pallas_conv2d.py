"""Exact parity for the fused Pallas Conv2dBlock (ops/pallas_conv2d.py).

Interpret mode on the CPU harness against a straight-line jnp reference
of conv3x3 -> ELU -> InstanceNorm (the DPCCN Conv2dBlock,
/root/reference/wesep/modules/dpccn/convs.py:28-47 semantics). Losses
use a random TARGET: the block output is normalized, so sum-of-squares
losses are nearly parameter-invariant and their gradients are pure
cancellation residuals (a degenerate metric — the round-4 on-chip
"28x grad mismatch" was exactly this).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.ops.pallas_conv2d import conv2d_block_in


def ref_block(x, k, b, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    e = jnp.where(y > 0, y, jnp.expm1(y))
    mu = e.mean(axis=(1, 2), keepdims=True)
    var = ((e - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    return (e - mu) * jax.lax.rsqrt(var + eps)


SHAPES = [
    (50, 37, 8, 16),    # odd F, small Ci
    (130, 65, 48, 32),  # multi-chunk T
    (90, 257, 16, 16),  # full-res DPCCN shape class
    (33, 17, 96, 32),   # wide concat input, tiny F
    (40, 33, 16, 64),   # P=2 packing
]


@pytest.mark.parametrize("t,f,ci,co", SHAPES)
def test_forward_parity(t, f, ci, co):
    rng = np.random.default_rng(t * 7 + ci)
    x = jnp.asarray(rng.standard_normal((2, t, f, ci)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    want = np.asarray(ref_block(x, k, b))
    got = np.asarray(conv2d_block_in(x, k, b))
    np.testing.assert_allclose(
        got, want, atol=2e-4 * np.abs(want).max(), rtol=0
    )


@pytest.mark.parametrize("t,f,ci,co", SHAPES[:4])
def test_grad_parity(t, f, ci, co):
    rng = np.random.default_rng(t * 13 + co)
    x = jnp.asarray(rng.standard_normal((2, t, f, ci)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, t, f, co)), jnp.float32)

    def loss(fn, *a):
        return jnp.sum((fn(*a) - tgt) ** 2)

    gr = jax.grad(lambda *a: loss(ref_block, *a), argnums=(0, 1, 2))(
        x, k, b
    )
    gk = jax.grad(lambda *a: loss(conv2d_block_in, *a), argnums=(0, 1, 2))(
        x, k, b
    )
    for nm, a, c in zip(("dx", "dk", "db"), gr, gk):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=3e-4 * scale, rtol=0,
            err_msg=nm,
        )


def test_model_route_parity(monkeypatch):
    """DPCCN with conv_impl='pallas' (forced interpret off-TPU) matches
    the XLA path with an identical param tree."""
    from wesep_tpu.models import get_model

    monkeypatch.setenv("WESEP_CONV2D_PALLAS", "force")
    args = dict(spk_emb_dim=16, win=512, stride=128, joint_training=False,
                tcn_layers=1, tcn_blocks=2)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32) * 0.1
    emb = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    m_p = get_model("DPCCN")(**args, conv_impl="pallas")
    m_x = get_model("DPCCN")(**args)
    v = m_x.init(jax.random.PRNGKey(0), mix, emb, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_p.init(jax.random.PRNGKey(0), mix, emb, train=False)
    )
    y_x = np.asarray(m_x.apply(v, mix, emb, train=False)[0])
    y_p = np.asarray(m_p.apply(v, mix, emb, train=False)[0])
    scale = np.abs(y_x).max()
    assert np.abs(y_x - y_p).max() < 2e-4 * scale
