"""Pallas LSTM kernel: forward + gradient parity vs the lax.scan path.

Runs in interpret mode on CPU (hermetic); the real-TPU speed check lives
in bench.py / verification drives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.ops.pallas_lstm import lstm_pallas


def _scan_lstm(xw, wh, reverse=False):
    h = wh.shape[0]

    def step(carry, xw_t):
        hh, cc = carry
        g = xw_t.astype(jnp.float32) + jnp.dot(
            hh.astype(xw.dtype), wh, preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h : 2 * h])
        gg = jnp.tanh(g[:, 2 * h : 3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h :])
        cc = f * cc + i * gg
        hh = o * jnp.tanh(cc)
        return (hh, cc), hh.astype(xw.dtype)

    b = xw.shape[1]
    init = (jnp.zeros((b, h), jnp.float32), jnp.zeros((b, h), jnp.float32))
    _, ys = jax.lax.scan(step, init, xw, reverse=reverse)
    return ys


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(reverse):
    rng = np.random.default_rng(0)
    t, b, h = 12, 16, 128
    xw = jnp.asarray(
        rng.standard_normal((t, b, 4 * h)).astype(np.float32) * 0.3
    )
    wh = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.1
    )
    got = lstm_pallas(xw, wh, reverse)
    want = _scan_lstm(xw, wh, reverse)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_gradient_parity(reverse):
    rng = np.random.default_rng(1)
    t, b, h = 8, 8, 128
    xw = jnp.asarray(
        rng.standard_normal((t, b, 4 * h)).astype(np.float32) * 0.3
    )
    wh = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.1
    )
    tgt = jnp.asarray(rng.standard_normal((t, b, h)).astype(np.float32))

    def loss_pallas(xw, wh):
        return jnp.sum((lstm_pallas(xw, wh, reverse) - tgt) ** 2)

    def loss_scan(xw, wh):
        return jnp.sum((_scan_lstm(xw, wh, reverse) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(xw, wh)
    gs = jax.grad(loss_scan, argnums=(0, 1))(xw, wh)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gs[0]), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gs[1]), atol=2e-3, rtol=1e-3
    )


def test_batch_tiling():
    """b_tile < B path: multiple batch tiles with per-tile carry reset."""
    rng = np.random.default_rng(2)
    t, b, h = 6, 2048, 128  # forces tiling at the 2MB budget
    xw = jnp.asarray(
        rng.standard_normal((t, b, 4 * h)).astype(np.float32) * 0.2
    )
    wh = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.1
    )
    got = lstm_pallas(xw, wh, False)
    want = _scan_lstm(xw, wh, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_fused_gradient_parity(reverse):
    from wesep_tpu.ops.pallas_lstm import lstm_fused

    rng = np.random.default_rng(3)
    b, t, d, h = 8, 10, 64, 128
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    wx = jnp.asarray(
        rng.standard_normal((d, 4 * h)).astype(np.float32) * 0.1
    )
    bias = jnp.asarray(
        rng.standard_normal((4 * h,)).astype(np.float32) * 0.1
    )
    wh = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.1
    )
    tgt = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32))

    def ref(x, wx, bias, wh):
        xw = jnp.swapaxes(
            jnp.einsum("btd,dh->bth", x, wx) + bias, 0, 1
        )
        ys = _scan_lstm(xw, wh, reverse)
        return jnp.sum((jnp.swapaxes(ys, 0, 1) - tgt) ** 2)

    def fused(x, wx, bias, wh):
        return jnp.sum((lstm_fused(x, wx, bias, wh, reverse) - tgt) ** 2)

    gr = jax.grad(ref, argnums=(0, 1, 2, 3))(x, wx, bias, wh)
    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(x, wx, bias, wh)
    for i, (a, c) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=3e-3, rtol=2e-3,
            err_msg=f"grad {i}",
        )
