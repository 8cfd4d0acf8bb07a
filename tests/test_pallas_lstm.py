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


def _ref_bilstm(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    """Reference via the two-pass scan path."""
    def one(wx, b, wh, reverse):
        xw = jnp.einsum("btd,dh->bth", x, wx,
                        preferred_element_type=jnp.float32)
        xw = (xw + b).astype(x.dtype)
        ys = _scan_lstm(jnp.swapaxes(xw, 0, 1), wh, reverse)
        return jnp.swapaxes(ys, 0, 1)

    return jnp.concatenate(
        [one(wx_f, b_f, wh_f, False), one(wx_b, b_b, wh_b, True)], axis=-1
    )


def _bi_inputs(seed=2, b=8, t=10, d=64, h=128):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2
    )
    return (r(b, t, d), r(d, 4 * h), r(4 * h), r(h, 4 * h),
            r(d, 4 * h), r(4 * h), r(h, 4 * h))


def test_bilstm_fused_forward_parity():
    from wesep_tpu.ops.pallas_lstm import bilstm_fused

    args = _bi_inputs()
    got = bilstm_fused(*args)
    want = _ref_bilstm(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_bilstm_fused_gradient_parity():
    from wesep_tpu.ops.pallas_lstm import bilstm_fused

    args = _bi_inputs(seed=3, b=8, t=6, d=64, h=128)

    def loss_fused(*a):
        return jnp.sum(jnp.tanh(bilstm_fused(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_ref_bilstm(*a)))

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3,
            err_msg=f"grad argnum {i}",
        )


def test_module_bilstm_uses_fused_kernel_numerics():
    """models.common.LSTM (bidirectional) stays scan-equivalent through
    the rnn.bilstm dispatch layer."""
    from wesep_tpu.ops.rnn import bilstm

    args = _bi_inputs(seed=4, b=5, t=7, d=64, h=128)  # b=5: pad path
    got = bilstm(args[0], args[1], args[3], args[2], args[4], args[6],
                 args[5])
    want = _ref_bilstm(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_bilstm_layer_forward_parity():
    """Fully-fused LAYER kernel (input projection in kernel) matches the
    two-pass scan reference."""
    from wesep_tpu.ops.pallas_lstm import bilstm_layer

    args = _bi_inputs(seed=5)
    got = bilstm_layer(*args)
    want = _ref_bilstm(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_bilstm_layer_gradient_parity():
    """In-kernel dWx/dWh/db/dx accumulation matches autodiff through the
    scan reference for all 7 inputs."""
    from wesep_tpu.ops.pallas_lstm import bilstm_layer

    args = _bi_inputs(seed=6, b=8, t=6, d=64, h=128)

    def loss_layer(*a):
        return jnp.sum(jnp.tanh(bilstm_layer(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_ref_bilstm(*a)))

    got = jax.grad(loss_layer, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3,
            err_msg=f"grad argnum {i}",
        )


# shared by both tile-picker invariant tests (kept in ONE place so cap/
# shape tuning can't diverge between them — ADVICE r3)
TILE_PICKER_SHAPES = [(64, 512), (256, 1024), (512, 1024), (752, 512),
                      (1520, 768), (6016, 512), (8, 64), (40, 256)]


def _tile_floor(b, cap):
    """Sparse-divisor folds must not collapse absurdly: the pick is at
    least the largest divisor <= 1/8 of the cap."""
    return max(
        (d for d in range(1, min(cap // 8, b) + 1) if b % d == 0),
        default=1,
    )


def test_tile_picker_invariants():
    """Tiles must divide the folded batch and stay within the
    compile-proven row caps (f32 fwd 384 regression: tile 752 hung
    Mosaic; sparse-divisor folds like 752=16x47 must not collapse to
    tiny tiles)."""
    import itertools

    from wesep_tpu.ops.pallas_lstm import (
        _MAX_TILE_ROWS_BWD,
        _MAX_TILE_ROWS_FWD,
        _pick_b_tile,
        _pick_b_tile_bi_bwd,
        _pick_b_tile_bi_fwd,
        _pick_b_tile_bwd,
    )

    for (b, h4), dt in itertools.product(
        TILE_PICKER_SHAPES, (jnp.float32, jnp.bfloat16)
    ):
        s = 2 if dt == jnp.bfloat16 else 4
        for pick, cap in (
            (_pick_b_tile, _MAX_TILE_ROWS_FWD[s]),
            (_pick_b_tile_bi_fwd, _MAX_TILE_ROWS_FWD[s]),
            (_pick_b_tile_bwd, _MAX_TILE_ROWS_BWD[s]),
            (_pick_b_tile_bi_bwd, _MAX_TILE_ROWS_BWD[s]),
        ):
            tile = pick(b, h4, dt)
            assert b % tile == 0, (pick.__name__, b, h4, dt, tile)
            assert tile <= cap, (pick.__name__, b, h4, dt, tile)
            floor = _tile_floor(b, cap)
            assert tile >= floor, (pick.__name__, b, h4, dt, tile, floor)


def test_layer_tile_picker_invariants():
    """The fused-LAYER pickers (extra input-dim term in the VMEM model)
    obey the same divisor/cap/floor rules."""
    import itertools

    from wesep_tpu.ops.pallas_lstm import (
        _MAX_TILE_ROWS_BWD,
        _pick_b_tile_layer_bwd,
        _pick_b_tile_layer_fwd,
    )

    for (b, h4), dt, d in itertools.product(
        TILE_PICKER_SHAPES, (jnp.float32, jnp.bfloat16), (64, 256)
    ):
        s = 2 if dt == jnp.bfloat16 else 4
        cap = _MAX_TILE_ROWS_BWD[s]
        for pick in (_pick_b_tile_layer_fwd, _pick_b_tile_layer_bwd):
            tile = pick(b, d, h4, dt)
            assert b % tile == 0, (pick.__name__, b, d, h4, dt, tile)
            assert tile <= cap, (pick.__name__, b, d, h4, dt, tile)
            floor = _tile_floor(b, cap)
            assert tile >= floor, (pick.__name__, b, d, h4, dt, tile, floor)


def test_bilstm_layer_batch_tiling():
    """nb>1 path of the LAYER kernels: per-tile carry reset in the
    forward and per-tile dWx/dWh/db accumulator reset + cross-tile sum
    in the backward (the bug class test_batch_tiling covers for
    lstm_pallas — ADVICE r3). b=1024 > the 384-row f32 cap forces 4
    batch tiles in both directions."""
    from wesep_tpu.ops.pallas_lstm import (
        _pick_b_tile_layer_bwd,
        _pick_b_tile_layer_fwd,
        bilstm_layer,
    )

    b, t, d, h = 1024, 4, 64, 128
    assert _pick_b_tile_layer_fwd(b, d, 4 * h, jnp.float32) < b
    assert _pick_b_tile_layer_bwd(b, d, 4 * h, jnp.float32) < b
    args = _bi_inputs(seed=7, b=b, t=t, d=d, h=h)

    got = bilstm_layer(*args)
    want = _ref_bilstm(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )

    def loss_layer(*a):
        return jnp.sum(jnp.tanh(bilstm_layer(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_ref_bilstm(*a)))

    # weight grads sum across batch tiles; x-grads exercise per-tile dx
    gl = jax.grad(loss_layer, argnums=(0, 1, 3, 2))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3, 2))(*args)
    for i, (g, w) in enumerate(zip(gl, gr)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3,
            err_msg=f"grad {i}",
        )


def test_flop_ledger_fresh_trace():
    """The analytic FLOP ledger fills on a FRESH trace even after the same
    function object was jitted and executed (the jaxpr cache would
    otherwise skip the recording Python — the r4 bench 0.0-gflops bug)."""
    from wesep_tpu.ops import pallas_lstm as P

    args = _bi_inputs(seed=8, b=8, t=4, d=64, h=128)
    b, t, d, h = 8, 4, 64, 128

    def loss(*a):
        return jnp.sum(P.bilstm_layer(*a))

    g = jax.grad(loss, argnums=(0,))
    jax.jit(g)(*args)  # populate the jaxpr cache
    P.reset_flop_ledger()
    jax.eval_shape(lambda *a: g(*a), *args)
    want = (2 * 2 + 2 * 6) * t * b * (d + h) * 4 * h
    assert P.flop_ledger() == want


@pytest.mark.parametrize("ks,hs", [(4, 1), (2, 1), (4, 2), (3, 3)])
def test_bilstm_layer_unfold_parity(ks, hs):
    """Unfold-fused kernel == unfold_frames + bilstm_layer for values AND
    all 7 gradients (study kernel, WESEP_LSTM_UNFOLD=1 path; measured
    slower in-model at TF-GridNet shapes — BASELINE.md r5 — but must
    stay correct). Torch-scale init keeps the comparison away from the
    saturated-gate regime where ANY two f32 LSTM implementations diverge
    chaotically (verified: bilstm_layer-vs-scan diverges identically
    there)."""
    from wesep_tpu.ops.pallas_lstm import bilstm_layer, bilstm_layer_unfold
    from wesep_tpu.ops.rnn import unfold_frames

    b, l_len, c, h = 8, 18, 16, 32
    rng = np.random.default_rng(ks * 10 + hs)
    scale = 1.0 / np.sqrt(h)
    x = jnp.asarray(rng.standard_normal((b, l_len, c)).astype(np.float32))

    def mk(shape):
        return jnp.asarray(
            (rng.uniform(-scale, scale, shape)).astype(np.float32)
        )

    wx_f, wh_f, b_f = mk((ks * c, 4 * h)), mk((h, 4 * h)), mk((4 * h,))
    wx_b, wh_b, b_b = mk((ks * c, 4 * h)), mk((h, 4 * h)), mk((4 * h,))

    def f_ref(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
        xu = unfold_frames(x, ks, hs)
        return bilstm_layer(xu, wx_f, b_f, wh_f, wx_b, b_b, wh_b)

    def f_new(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
        return bilstm_layer_unfold(
            x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ks, hs
        )

    args = (x, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
    np.testing.assert_allclose(
        np.asarray(f_new(*args)), np.asarray(f_ref(*args)),
        atol=1e-5, rtol=1e-5,
    )
    got = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(f_new(*a))), argnums=tuple(range(7))
    )(*args)
    want = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(f_ref(*a))), argnums=tuple(range(7))
    )(*args)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3,
            err_msg=f"grad argnum {i}",
        )


def test_lstm_module_unfold_param_tree_unchanged():
    """LSTM(unfold_ks=4) on raw [B, L, C] must build the SAME param tree
    as LSTM() on the pre-unfolded stream (checkpoint/torch-port
    compatibility) and agree numerically on the fallback path."""
    from wesep_tpu.models.common import LSTM
    from wesep_tpu.ops.rnn import unfold_frames

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 14, 16)).astype(np.float32))
    m_new = LSTM(hidden=32, unfold_ks=4, unfold_hs=1)
    m_old = LSTM(hidden=32)
    xu = unfold_frames(x, 4, 1)
    p_new = m_new.init(jax.random.PRNGKey(0), x)
    p_old = m_old.init(jax.random.PRNGKey(0), xu)
    shapes_new = jax.tree.map(lambda a: a.shape, p_new)
    shapes_old = jax.tree.map(lambda a: a.shape, p_old)
    assert shapes_new == shapes_old
    y_new = m_new.apply(p_old, x)
    y_old = m_old.apply(p_old, xu)
    np.testing.assert_allclose(
        np.asarray(y_new), np.asarray(y_old), atol=1e-6
    )
