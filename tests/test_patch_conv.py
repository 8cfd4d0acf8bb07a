"""Parity for the lane-packed block-Toeplitz 3x3 conv
(ops/patch_conv.py — the round-4 DPCCN patch-matmul study; in-model it
is falsified for both train and inference, see BASELINE.md, but the op
stays selectable via DPCCN(conv_impl="patch") and must remain exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.ops.patch_conv import conv3x3_patch


def _ref(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize(
    "F,Ci,Co",
    [
        (257, 16, 16),   # DPCCN enc0 (P=8)
        (257, 80, 16),   # enc0 conv5 (widest concat input)
        (129, 64, 32),   # mid U-Net (P=4)
        (33, 64, 64),    # P=2
        (17, 96, 32),    # small F with halo blocks
        (7, 8, 200),     # Co > 128 -> P=1 degenerate path
    ],
)
def test_patch_conv_matches_lax_conv(F, Ci, Co):
    rng = np.random.default_rng(F * 1000 + Ci)
    x = jnp.asarray(rng.standard_normal((2, 14, F, Ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.01, jnp.float32)
    want = np.asarray(_ref(x, k, b))
    got = np.asarray(conv3x3_patch(x, k, b))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=0)


def test_patch_conv_grads_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 37, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)) * 0.01, jnp.float32)

    def loss(fn, x, k, b):
        return jnp.sum(jnp.tanh(fn(x, k, b)))

    gr = jax.grad(lambda *a: loss(_ref, *a), argnums=(0, 1, 2))(x, k, b)
    gp = jax.grad(lambda *a: loss(conv3x3_patch, *a), argnums=(0, 1, 2))(
        x, k, b
    )
    for a, c in zip(gr, gp):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=5e-5, rtol=0
        )


@pytest.mark.slow  # study-artifact conv_impl (falsified path), 60s
def test_dpccn_conv_impl_patch_checkpoint_interchange():
    """conv_impl='patch' uses identical param names/shapes, so a
    checkpoint trained either way loads in both."""
    from wesep_tpu.models import get_model

    args = dict(spk_emb_dim=16, win=512, stride=128, joint_training=False)
    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32) * 0.1
    emb = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    m_x = get_model("DPCCN")(**args)
    m_p = get_model("DPCCN")(**args, conv_impl="patch")
    v = m_x.init(jax.random.PRNGKey(0), mix, emb, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_p.init(jax.random.PRNGKey(0), mix, emb, train=False)
    )
    y_x = np.asarray(m_x.apply(v, mix, emb, train=False)[0])
    y_p = np.asarray(m_p.apply(v, mix, emb, train=False)[0])
    # bit-exactness is not expected (different contraction order,
    # amplified by ~45 instance norms); waveform-level closeness is
    scale = np.abs(y_x).max()
    assert np.abs(y_x - y_p).max() < 0.02 * scale
