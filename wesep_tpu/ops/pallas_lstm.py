"""Pallas TPU LSTM-scan kernel with custom VJP.

The fused lax.scan LSTM (ops/rnn.py) is the main speed-of-light gap on
TPU: each scan step re-issues tiny HLO ops and re-stages the weights, so a
376-step BSRNN scan runs ~10x slower than the hardware allows. This kernel
runs the WHOLE recurrence inside one pallas_call: the hidden/cell state
and the [H, 4H] gate weights stay resident in VMEM across the sequential
grid, each step is a single [B_tile, H] @ [H, 4H] MXU matmul + VPU gates,
and the time-blocked xw/ys streams are double-buffered by the Pallas
pipeline (measured ~10x over lax.scan on v5e at BSRNN shapes).

Gradients: custom VJP. The forward kernel also emits the cell-state
sequence; the backward kernel replays the standard LSTM adjoint recurrence
in reverse (recomputing gate activations from xw and the saved h instead
of storing [T, B, 4H] activations), accumulating dWh in VMEM and streaming
dxw. Exact parity with the lax.scan path (same f32 accumulation).

Falls back to interpret mode off-TPU so tests stay hermetic.
"""

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lstm_pallas",
    "lstm_fused",
    "bilstm_fused",
    "bilstm_layer",
    "bilstm_layer_unfold",
    "pallas_available",
]


def pallas_available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


# ---- analytic FLOP ledger (trace-time) --------------------------------------
#
# XLA's compiled.cost_analysis() reports ~0 flops for Pallas custom calls,
# so an MFU computed from it undercounts everything inside these kernels —
# and the undercount GREW when round 3 moved the input projections
# in-kernel (bilstm_layer), making the committed gflops/MFU numbers drop
# while real utilization improved. Fix: each kernel-impl below adds its
# analytic matmul FLOPs to this ledger at TRACE time. Benchmarks reset the
# ledger, trace/lower the step exactly once, then read it back and add it
# to the XLA-visible count (one trace == one step's worth of dispatches).
# Only MXU matmul FLOPs are counted (the MFU convention); VPU gate math is
# ~H/20x smaller and excluded.
# Two counters (VERDICT r4 #8): "flops" is EXECUTED MXU FLOPs (includes
# the backward kernels' in-kernel gate/activation recompute — a memory-
# saving implementation choice); "model_flops" is the strict model-FLOP
# count (fwd + the mathematically required dx/dW dots only). MFU from the
# first is executed-FLOP utilization; from the second, strict MFU.
_FLOP_LEDGER = {"flops": 0.0, "model_flops": 0.0}


def reset_flop_ledger():
    _FLOP_LEDGER["flops"] = 0.0
    _FLOP_LEDGER["model_flops"] = 0.0


def flop_ledger() -> float:
    """Analytic executed matmul FLOPs recorded by Pallas dispatches since
    the last reset (trace-time; call around a single .lower()/trace)."""
    return _FLOP_LEDGER["flops"]


def model_flop_ledger() -> float:
    """Strict model-FLOP count (executed minus in-kernel recompute)."""
    return _FLOP_LEDGER["model_flops"]


def _record_flops(n, model=None):
    _FLOP_LEDGER["flops"] += float(n)
    _FLOP_LEDGER["model_flops"] += float(n if model is None else model)


# The grid of every kernel here is (nb, T) and Pallas grids run
# SEQUENTIALLY on the core, so total sequential steps = nb * T. The tile
# pickers model each kernel's actual VMEM working set (the pipeline
# double-buffers every block whose index map varies; weights are single-
# buffered) and take the LARGEST tile that fits. Measured on v5e this is
# only a ~1% end-to-end win (BSRNN band fwd nb 4 -> 1, TF-GridNet intra
# fwd nb 10 -> 2, both nearly neutral): per-grid-step time scales with
# the tile (the VPU gate math is the per-step bound, not dot-issue
# latency), so fewer-but-bigger steps mostly conserve total time. Kept
# because the accurate model also ADMITS large single-tile folds that
# the old heuristic rejected, and it documents the real VMEM shape.
# Hard row caps per (dtype width, kernel): tiles beyond these sizes hit
# pathological Mosaic compile times (minutes to never) on v5e via the
# remote compile helper. The caps are the LARGEST sizes proven to
# compile in the recorded benches (bf16 fwd 752, every bwd <= 376,
# f32 fwd 376); since tile size is perf-neutral (see the note above),
# staying inside proven sizes costs nothing.
_MAX_TILE_ROWS_FWD = {2: 752, 4: 384}
_MAX_TILE_ROWS_BWD = {2: 384, 4: 384}
_VMEM_LIMIT = 14 * 1024 * 1024  # tolerated working set at a chosen tile


def _fit_tile(b: int, per_row_bytes: int, fixed_bytes: int,
              max_rows: int) -> int:
    """Largest multiple-of-8 divisor of b within the row cap whose
    modeled working set fits VMEM (divisors of folded batches can be
    sparse — e.g. 752 = 16 x 47 — so search divisors under the model
    rather than deriving a byte cap first)."""
    tile = min(b, (max_rows // 8) * 8)
    tile = max(tile, 1)
    while tile > 1:
        if b % tile == 0 and (
            fixed_bytes + tile * per_row_bytes <= _VMEM_LIMIT
        ):
            return tile
        tile -= 8 if tile > 8 else 1
    return 1


def _pick_b_tile(b: int, h4: int, dtype) -> int:
    """Tile for the unidirectional FORWARD kernel (_forward).

    Per tile*h4 bytes: xw in (dbl) 2s + ys out (dbl, H) s/2 + cs out
    (dbl, H, f32) 2 + scratch (2xH f32) 2; fixed: wh."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    return _fit_tile(b, int((2.5 * s + 4) * h4), h * h4 * s,
                     _MAX_TILE_ROWS_FWD[s])


def _pick_b_tile_bwd(b: int, h4: int, dtype) -> int:
    """Tile for the unidirectional BACKWARD kernel (_bwd).

    Per tile*h4 bytes: xw+dxw (dbl) 4s + ys/dys prev (dbl, H) s +
    cs prev/cur (dbl, H, f32) 4 + scratch 2; fixed: wh + dwh acc/out."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    return _fit_tile(b, (5 * s + 6) * h4, h * h4 * (s + 12),
                     _MAX_TILE_ROWS_BWD[s])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_pallas(xw: jnp.ndarray, wh: jnp.ndarray, reverse: bool = False):
    """xw: [T, B, 4H] (x @ Wx + b precomputed), wh: [H, 4H] -> ys [T, B, H].

    Gate order (i, f, g, o), torch parity — identical to ops/rnn._lstm_scan.
    """
    ys, _ = _forward(xw, wh, reverse)
    return ys


def _forward(xw, wh, reverse):
    t_len, b, h4 = xw.shape
    h = h4 // 4
    b_tile = _pick_b_tile(b, h4, xw.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    _record_flops(2 * t_len * b * h * h4)  # h @ wh per step

    def kernel(xw_ref, wh_ref, ys_ref, cs_ref, h_ref, c_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        g = xw_ref[0].astype(jnp.float32) + jnp.dot(
            h_ref[:].astype(xw_ref.dtype),
            wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h : 2 * h])
        gg = jnp.tanh(g[:, 2 * h : 3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h :])
        c = f * c_ref[:] + i * gg
        hidden = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = hidden
        ys_ref[0] = hidden.astype(ys_ref.dtype)
        cs_ref[0] = c.astype(cs_ref.dtype)

    t_index = (
        (lambda bi, t: (t_len - 1 - t, bi, 0))
        if reverse
        else (lambda bi, t: (t, bi, 0))
    )
    ys, cs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h), xw.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, h4), t_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h), t_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), t_index, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
        ],
        interpret=interpret,
    )(xw, wh)
    return ys, cs


def _fwd(xw, wh, reverse):
    ys, cs = _forward(xw, wh, reverse)
    return ys, (xw, wh, ys, cs)


def _bwd(reverse, res, dys):
    dxw, dwh, _ = _bwd_impl(reverse, res, dys)
    return dxw, dwh


def _bwd_impl(reverse, res, dys):
    """Adjoint kernel -> (dxw [T,B,4H], dwh [H,4H], db [4H]).

    The bias gradient sum(dgates) is accumulated INSIDE the kernel (f32,
    like dwh) so callers that need it (lstm_fused) don't re-read the
    [T, B, 4H] dxw stream from HBM just to reduce it."""
    xw, wh, ys, cs = res
    t_len, b, h4 = xw.shape
    h = h4 // 4
    b_tile = _pick_b_tile_bwd(b, h4, xw.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # 3 dots per step: gate recompute, dgates @ wh^T, h_prev^T @ dgates
    # (strict model bwd = the latter two; the recompute is implementation)
    _record_flops(6 * t_len * b * h * h4, model=4 * t_len * b * h * h4)

    def kernel(xw_ref, wh_ref, ysp_ref, csp_ref, cs_ref, dys_ref,
               dxw_ref, dwh_ref, db_ref, dh_ref, dc_ref, dwh_acc, db_acc):
        tr = pl.program_id(1)  # adjoint walk: 0 .. T-1 (reverse of scan)

        @pl.when(tr == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dc_ref[:] = jnp.zeros_like(dc_ref)
            dwh_acc[:] = jnp.zeros_like(dwh_acc)
            db_acc[:] = jnp.zeros_like(db_acc)

        # boundary: the scan's first step had zero carry-in
        is_boundary = tr == t_len - 1
        h_prev = jnp.where(
            is_boundary, jnp.zeros_like(ysp_ref[0]), ysp_ref[0]
        ).astype(jnp.float32)
        c_prev = jnp.where(is_boundary, jnp.zeros_like(csp_ref[0]),
                           csp_ref[0])

        g = xw_ref[0].astype(jnp.float32) + jnp.dot(
            h_prev.astype(xw_ref.dtype),
            wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h : 2 * h])
        gg = jnp.tanh(g[:, 2 * h : 3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h :])
        c_t = cs_ref[0]
        tanh_c = jnp.tanh(c_t)

        dh_total = dys_ref[0].astype(jnp.float32) + dh_ref[:]
        do = dh_total * tanh_c
        dc = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_ref[:]
        di = dc * gg
        df = dc * c_prev
        dgg = dc * i
        dc_prev = dc * f

        dgi = di * i * (1.0 - i)
        dgf = df * f * (1.0 - f)
        dgc = dgg * (1.0 - gg * gg)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgc, dgo], axis=-1)

        dh_prev = jnp.dot(
            dgates.astype(xw_ref.dtype),
            wh_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        dwh_acc[:] += jnp.dot(
            h_prev.astype(xw_ref.dtype).T,
            dgates.astype(xw_ref.dtype),
            preferred_element_type=jnp.float32,
        )

        dxw_ref[0] = dgates.astype(dxw_ref.dtype)
        dh_ref[:] = dh_prev
        dc_ref[:] = dc_prev
        db_acc[:] += jnp.sum(dgates, axis=0, keepdims=True)

        @pl.when(is_boundary)
        def _():
            dwh_ref[0] = dwh_acc[:]
            db_ref[0] = db_acc[:]

    # The scan visited time t in order `scan_t(k)`; the adjoint walks
    # k = T-1-tr. cur = time index of the current adjoint step; prev =
    # time index of the scan's PREVIOUS step (clamped at the boundary).
    if reverse:
        # scan order was t = T-1 .. 0; adjoint walks t = 0 .. T-1
        cur = lambda bi, tr: (tr, bi, 0)  # noqa: E731
        prev = lambda bi, tr: (jnp.minimum(tr + 1, t_len - 1), bi, 0)  # noqa: E731
    else:
        # scan order was t = 0 .. T-1; adjoint walks t = T-1 .. 0
        cur = lambda bi, tr: (t_len - 1 - tr, bi, 0)  # noqa: E731
        prev = lambda bi, tr: (  # noqa: E731
            jnp.maximum(t_len - 2 - tr, 0), bi, 0
        )

    dxw, dwh_tiles, db_tiles = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h4), xw.dtype),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, h4), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda bi, tr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h4), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
        ],
        interpret=interpret,
    )(xw, wh, ys, cs, cs, dys)
    return (
        dxw,
        jnp.sum(dwh_tiles, axis=0).astype(wh.dtype),
        jnp.sum(db_tiles, axis=(0, 1)),
    )


lstm_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_fused(x, wx, b, wh, reverse: bool = False):
    """Full LSTM layer with memory-lean residuals.

    x: [B, T, D]; wx: [D, 4H]; b: [4H]; wh: [H, 4H] -> ys [B, T, H].

    Unlike lstm_pallas (which is differentiated w.r.t. its xw input and
    therefore saves the [T, B, 4H] gate projections as residuals — 4H/D x
    the input size), this op recomputes xw = x @ wx + b in the backward
    pass and saves only (x, ys, cs). That shrinks per-layer residuals
    enough that BSRNN trains WITHOUT rematerialization: no forward
    replay in the backward pass.
    """
    ys, _ = _fused_fwd_impl(x, wx, b, wh, reverse)
    return ys


def _xw_time_major(x, wx, b):
    xw = jnp.einsum(
        "btd,dh->bth", x, wx, preferred_element_type=jnp.float32
    )
    return jnp.swapaxes((xw + b).astype(x.dtype), 0, 1)  # [T, B, 4H]


def _fused_fwd_impl(x, wx, b, wh, reverse):
    xw = _xw_time_major(x, wx, b)
    ys, cs = _forward(xw, wh.astype(x.dtype), reverse)
    return jnp.swapaxes(ys, 0, 1), cs


def _fused_fwd(x, wx, b, wh, reverse):
    ys, cs = _fused_fwd_impl(x, wx, b, wh, reverse)
    return ys, (x, wx, b, wh, ys, cs)


def _fused_bwd(reverse, res, dys):
    x, wx, b, wh, ys, cs = res
    xw = _xw_time_major(x, wx, b)  # recomputed, not saved
    ys_tm = jnp.swapaxes(ys, 0, 1)
    dys_tm = jnp.swapaxes(dys, 0, 1).astype(x.dtype)
    dxw, dwh, db = _bwd_impl(
        reverse, (xw, wh.astype(x.dtype), ys_tm, cs), dys_tm
    )
    dxw_bm = jnp.swapaxes(dxw, 0, 1)  # [B, T, 4H]
    dx = jnp.einsum(
        "bth,dh->btd", dxw_bm, wx.astype(dxw_bm.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dwx = jnp.einsum(
        "btd,bth->dh", x, dxw_bm, preferred_element_type=jnp.float32
    ).astype(wx.dtype)
    return dx, dwx, db.astype(b.dtype), dwh.astype(wh.dtype)


lstm_fused.defvjp(_fused_fwd, _fused_bwd)


# ---- fused BIDIRECTIONAL kernel ---------------------------------------------
#
# A bidirectional LSTM as two pallas_calls leaves the MXU half idle: each
# sequential step is one small [B_tile, H] @ [H, 4H] dot whose result the
# VPU must gate before the next dot can issue. Fusing both directions into
# ONE kernel gives every grid step two INDEPENDENT recurrences (forward at
# time t, backward at time T-1-t): while the VPU gates one direction's
# dot, the other direction's dot runs on the MXU — pipelining away the
# dependency bubble (the PARITY.md "fuse both directions" lever).


def _pick_b_tile_bi_fwd(b: int, h4: int, dtype) -> int:
    """Tile for _bi_forward: both directions' streams in one kernel.

    Per tile*h4 bytes: xw in (2 dirs, dbl) 4s + ys out (2 dirs, dbl, H)
    s + cs out (2 dirs, dbl, H, f32) 4 + scratch (4xH f32) 4;
    fixed: 2x wh."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    return _fit_tile(b, (5 * s + 8) * h4, 2 * h * h4 * s,
                     _MAX_TILE_ROWS_FWD[s])


def _pick_b_tile_bi_bwd(b: int, h4: int, dtype) -> int:
    """Tile for _bi_backward.

    Per tile*h4 bytes: xw+dxw (2 dirs, dbl) 8s + ys/dys prev (2 dirs,
    dbl, H) 2s + cs prev/cur (2 dirs, dbl, H, f32) 8 + scratch 4;
    fixed: 2x (wh + dwh acc/out)."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    return _fit_tile(b, (10 * s + 12) * h4, 2 * h * h4 * (s + 12),
                     _MAX_TILE_ROWS_BWD[s])


def _bi_forward(xw_f, xw_b, wh_f, wh_b):
    t_len, b, h4 = xw_f.shape
    h = h4 // 4
    b_tile = _pick_b_tile_bi_fwd(b, h4, xw_f.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    _record_flops(2 * 2 * t_len * b * h * h4)  # 2 dirs, h @ wh per step

    def gates(xw_blk, h_state, wh_ref):
        g = xw_blk.astype(jnp.float32) + jnp.dot(
            h_state.astype(xw_blk.dtype),
            wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        return i, f, gg, o

    def kernel(xwf_ref, xwb_ref, whf_ref, whb_ref,
               ysf_ref, ysb_ref, csf_ref, csb_ref,
               hf_ref, cf_ref, hb_ref, cb_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            cf_ref[:] = jnp.zeros_like(cf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)
            cb_ref[:] = jnp.zeros_like(cb_ref)

        # the two dots are data-independent: Mosaic overlaps dot(b) with
        # the VPU gate math of (f) and vice versa
        i_f, f_f, g_f, o_f = gates(xwf_ref[0], hf_ref[:], whf_ref)
        i_b, f_b, g_b, o_b = gates(xwb_ref[0], hb_ref[:], whb_ref)

        c_f = f_f * cf_ref[:] + i_f * g_f
        h_f = o_f * jnp.tanh(c_f)
        cf_ref[:] = c_f
        hf_ref[:] = h_f
        ysf_ref[0] = h_f.astype(ysf_ref.dtype)
        csf_ref[0] = c_f

        c_b = f_b * cb_ref[:] + i_b * g_b
        h_b = o_b * jnp.tanh(c_b)
        cb_ref[:] = c_b
        hb_ref[:] = h_b
        ysb_ref[0] = h_b.astype(ysb_ref.dtype)
        csb_ref[0] = c_b

    fwd_ix = lambda bi, t: (t, bi, 0)  # noqa: E731
    bwd_ix = lambda bi, t: (t_len - 1 - t, bi, 0)  # noqa: E731
    wh_ix = lambda bi, t: (0, 0)  # noqa: E731
    ys_f, ys_b, cs_f, cs_b = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h), xw_f.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), xw_f.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, h4), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h4), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), wh_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), wh_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
        ],
        interpret=interpret,
    )(xw_f, xw_b, wh_f, wh_b)
    return ys_f, ys_b, cs_f, cs_b


def _bi_backward(xw_f, xw_b, wh_f, wh_b, ys_f, ys_b, cs_f, cs_b,
                 dys_f, dys_b):
    t_len, b, h4 = xw_f.shape
    h = h4 // 4
    b_tile = _pick_b_tile_bi_bwd(b, h4, xw_f.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # 2 dirs x 3 dots per step (1 of 3 is gate recompute, not model work)
    _record_flops(2 * 6 * t_len * b * h * h4,
                  model=2 * 4 * t_len * b * h * h4)

    def adjoint(xw_blk, wh_ref, h_prev, c_prev, c_t, dy_blk, dh, dc):
        """One direction's adjoint step -> (dgates, dh_prev, dc_prev,
        dwh_inc)."""
        g = xw_blk.astype(jnp.float32) + jnp.dot(
            h_prev.astype(xw_blk.dtype),
            wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        tanh_c = jnp.tanh(c_t)
        dh_total = dy_blk.astype(jnp.float32) + dh
        do = dh_total * tanh_c
        dct = dh_total * o * (1.0 - tanh_c * tanh_c) + dc
        dgi = (dct * gg) * i * (1.0 - i)
        dgf = (dct * c_prev) * f * (1.0 - f)
        dgc = (dct * i) * (1.0 - gg * gg)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgc, dgo], axis=-1)
        dh_prev = jnp.dot(
            dgates.astype(xw_blk.dtype), wh_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        dwh_inc = jnp.dot(
            h_prev.astype(xw_blk.dtype).T, dgates.astype(xw_blk.dtype),
            preferred_element_type=jnp.float32,
        )
        return dgates, dh_prev, dct * f, dwh_inc

    def kernel(xwf_ref, xwb_ref, whf_ref, whb_ref,
               yspf_ref, yspb_ref, cspf_ref, cspb_ref,
               csf_ref, csb_ref, dysf_ref, dysb_ref,
               dxwf_ref, dxwb_ref, dwhf_ref, dwhb_ref,
               dbf_ref, dbb_ref,
               dhf, dcf, dhb, dcb, dwhf_acc, dwhb_acc,
               dbf_acc, dbb_acc):
        tr = pl.program_id(1)

        @pl.when(tr == 0)
        def _():
            dhf[:] = jnp.zeros_like(dhf)
            dcf[:] = jnp.zeros_like(dcf)
            dhb[:] = jnp.zeros_like(dhb)
            dcb[:] = jnp.zeros_like(dcb)
            dwhf_acc[:] = jnp.zeros_like(dwhf_acc)
            dwhb_acc[:] = jnp.zeros_like(dwhb_acc)
            dbf_acc[:] = jnp.zeros_like(dbf_acc)
            dbb_acc[:] = jnp.zeros_like(dbb_acc)

        is_boundary = tr == t_len - 1
        hp_f = jnp.where(
            is_boundary, jnp.zeros_like(yspf_ref[0]), yspf_ref[0]
        ).astype(jnp.float32)
        cp_f = jnp.where(is_boundary, jnp.zeros_like(cspf_ref[0]),
                         cspf_ref[0])
        hp_b = jnp.where(
            is_boundary, jnp.zeros_like(yspb_ref[0]), yspb_ref[0]
        ).astype(jnp.float32)
        cp_b = jnp.where(is_boundary, jnp.zeros_like(cspb_ref[0]),
                         cspb_ref[0])

        dg_f, dhp_f, dcp_f, dwi_f = adjoint(
            xwf_ref[0], whf_ref, hp_f, cp_f, csf_ref[0], dysf_ref[0],
            dhf[:], dcf[:],
        )
        dg_b, dhp_b, dcp_b, dwi_b = adjoint(
            xwb_ref[0], whb_ref, hp_b, cp_b, csb_ref[0], dysb_ref[0],
            dhb[:], dcb[:],
        )
        dxwf_ref[0] = dg_f.astype(dxwf_ref.dtype)
        dhf[:] = dhp_f
        dcf[:] = dcp_f
        dwhf_acc[:] += dwi_f
        dbf_acc[:] += jnp.sum(dg_f, axis=0, keepdims=True)
        dxwb_ref[0] = dg_b.astype(dxwb_ref.dtype)
        dhb[:] = dhp_b
        dcb[:] = dcp_b
        dwhb_acc[:] += dwi_b
        dbb_acc[:] += jnp.sum(dg_b, axis=0, keepdims=True)

        @pl.when(is_boundary)
        def _():
            dwhf_ref[0] = dwhf_acc[:]
            dwhb_ref[0] = dwhb_acc[:]
            dbf_ref[0] = dbf_acc[:]
            dbb_ref[0] = dbb_acc[:]

    # fwd scan order t = 0..T-1 -> adjoint cur = T-1-tr, prev = cur-1;
    # bwd scan order t = T-1..0 -> adjoint cur = tr, prev = tr+1
    cur_f = lambda bi, tr: (t_len - 1 - tr, bi, 0)  # noqa: E731
    prev_f = lambda bi, tr: (jnp.maximum(t_len - 2 - tr, 0), bi, 0)  # noqa: E731,E501
    cur_b = lambda bi, tr: (tr, bi, 0)  # noqa: E731
    prev_b = lambda bi, tr: (jnp.minimum(tr + 1, t_len - 1), bi, 0)  # noqa: E731,E501
    wh_ix = lambda bi, tr: (0, 0)  # noqa: E731

    (dxw_f, dxw_b, dwhf_tiles, dwhb_tiles,
     dbf_tiles, dbb_tiles) = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h4), xw_f.dtype),
            jax.ShapeDtypeStruct((t_len, b, h4), xw_f.dtype),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, h4), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h4), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), wh_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), wh_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h4), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h4), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), lambda bi, tr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
        ],
        interpret=interpret,
    )(xw_f, xw_b, wh_f, wh_b, ys_f, ys_b, cs_f, cs_b, cs_f, cs_b,
      dys_f, dys_b)
    return (
        dxw_f,
        dxw_b,
        jnp.sum(dwhf_tiles, axis=0),
        jnp.sum(dwhb_tiles, axis=0),
        jnp.sum(dbf_tiles, axis=(0, 1)),
        jnp.sum(dbb_tiles, axis=(0, 1)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bilstm_fused(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    """Fused bidirectional LSTM layer -> [B, T, 2H].

    Both recurrences run inside ONE Pallas kernel (see _bi_forward) with
    memory-lean residuals: xw is recomputed in the backward pass, only
    (x, ys, cs) are saved — same policy as lstm_fused.
    """
    ys, _ = _bi_fused_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
    return ys


def _bi_fused_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    xw_f = _xw_time_major(x, wx_f, b_f)
    xw_b = _xw_time_major(x, wx_b, b_b)
    ys_f, ys_b, cs_f, cs_b = _bi_forward(
        xw_f, xw_b, wh_f.astype(x.dtype), wh_b.astype(x.dtype)
    )
    ys = jnp.concatenate(
        [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)], axis=-1
    )
    return ys, (ys_f, ys_b, cs_f, cs_b)


def _bi_fused_fwd(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    ys, (ys_f, ys_b, cs_f, cs_b) = _bi_fused_fwd_impl(
        x, wx_f, b_f, wh_f, wx_b, b_b, wh_b
    )
    return ys, (x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ys_f, ys_b, cs_f,
                cs_b)


def _bi_fused_bwd(res, dys):
    (x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ys_f, ys_b, cs_f, cs_b) = res
    h = wh_f.shape[0]
    xw_f = _xw_time_major(x, wx_f, b_f)  # recomputed
    xw_b = _xw_time_major(x, wx_b, b_b)
    dys_f = jnp.swapaxes(dys[..., :h], 0, 1).astype(x.dtype)
    dys_b = jnp.swapaxes(dys[..., h:], 0, 1).astype(x.dtype)
    dxw_f, dxw_b, dwh_f, dwh_b, db_f, db_b = _bi_backward(
        xw_f, xw_b, wh_f.astype(x.dtype), wh_b.astype(x.dtype),
        ys_f, ys_b, cs_f, cs_b, dys_f, dys_b,
    )

    def grads(dxw, wx):
        dxw_bm = jnp.swapaxes(dxw, 0, 1)
        dx = jnp.einsum(
            "bth,dh->btd", dxw_bm, wx.astype(dxw_bm.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        dwx = jnp.einsum(
            "btd,bth->dh", x, dxw_bm, preferred_element_type=jnp.float32
        ).astype(wx.dtype)
        return dx, dwx

    dx_f, dwx_f = grads(dxw_f, wx_f)
    dx_b, dwx_b = grads(dxw_b, wx_b)
    return (
        dx_f + dx_b,
        dwx_f,
        db_f.astype(b_f.dtype),
        dwh_f.astype(wh_f.dtype),
        dwx_b,
        db_b.astype(b_b.dtype),
        dwh_b.astype(wh_b.dtype),
    )


bilstm_fused.defvjp(_bi_fused_fwd, _bi_fused_bwd)


# ---- fully-fused bidirectional LAYER kernel ---------------------------------
#
# bilstm_fused still stages the gate projections through HBM: the forward
# materializes xw = x @ Wx + b ([T, B, 4H] — 4H/D times the input size),
# the backward recomputes and re-reads it, and dxw makes the same round
# trip in reverse before the dx/dWx einsums re-read it again. At BSRNN
# band shapes that is ~3.8 GB of HBM traffic per layer direction — the
# dominant cost of the whole train step (xplane round-3 attribution:
# only 44% of the step is the recurrence itself).
#
# The LAYER kernels below never materialize xw/dxw. Each forward grid
# step computes this timestep's input projection on the MXU right next
# to the recurrence dot (x_t @ Wx is sequence-independent, so it
# pipelines into the recurrence's VPU-gate bubble), and the backward
# step recomputes the gates from (x_t, h_prev) and contracts dgates
# against Wx/ Wh/ x/ h IN KERNEL, accumulating dWx/dWh/db in VMEM and
# streaming only dx ([T, B, D] — 4H/D times smaller than dxw). HBM
# traffic per direction drops to x + ys + cs + dys + dx (~0.7 GB at
# band shapes, ~5x less).


def _pick_b_tile_layer_fwd(b: int, d: int, h4: int, dtype) -> int:
    """Tile for _bi_layer_forward.

    Per tile row: x in (2 dirs, dbl) 4*D*s + ys out (2 dirs, dbl, H) s +
    cs out (2 dirs, dbl, H, f32) 4 + state scratch (4xH f32) + gate
    temporaries (~2x 4H f32); fixed: 2x (wx + wh)."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    per_row = 4 * d * s + 4 * h * s + 16 * h + 16 * h + 8 * h4
    fixed = 2 * (d + h) * h4 * s
    return _fit_tile(b, per_row, fixed, _MAX_TILE_ROWS_BWD[s])


def _pick_b_tile_layer_bwd(b: int, d: int, h4: int, dtype) -> int:
    """Tile for _bi_layer_backward.

    Per tile row: x in + dx out (2 dirs, dbl) 8*D*s + ys prev (2 dirs,
    dbl, H) s + cs prev/cur (2 dirs, 2 streams, dbl, H, f32) +
    dys (2 dirs, dbl, H) s + adjoint scratch + dgates temporaries;
    fixed: 2x (wx + wh) + f32 acc/out for dwx/dwh."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    per_row = 8 * d * s + 4 * h * s + 32 * h + 4 * h * s + 16 * h + 8 * h4
    fixed = 2 * (d + h) * h4 * s + 4 * (d + h) * h4 * 4
    return _fit_tile(b, per_row, fixed, _MAX_TILE_ROWS_BWD[s])


def _bi_layer_forward(x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    """x_tm: [T, B, D]; biases as [1, 4H] -> (ys_f, ys_b, cs_f, cs_b)."""
    t_len, b, d = x_tm.shape
    h4 = wh_f.shape[1]
    h = h4 // 4
    b_tile = _pick_b_tile_layer_fwd(b, d, h4, x_tm.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # 2 dirs x (x @ wx + h @ wh) per step
    _record_flops(2 * 2 * t_len * b * (d + h) * h4)

    def gates(x_blk, wx_ref, b_ref, h_state, wh_ref):
        g = (
            jnp.dot(x_blk, wx_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0]
            + jnp.dot(
                h_state.astype(x_blk.dtype),
                wh_ref[:],
                preferred_element_type=jnp.float32,
            )
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        return i, f, gg, o

    def kernel(xf_ref, xb_ref, wxf_ref, bf_ref, whf_ref,
               wxb_ref, bb_ref, whb_ref,
               ysf_ref, ysb_ref, csf_ref, csb_ref,
               hf_ref, cf_ref, hb_ref, cb_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            cf_ref[:] = jnp.zeros_like(cf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)
            cb_ref[:] = jnp.zeros_like(cb_ref)

        i_f, f_f, g_f, o_f = gates(xf_ref[0], wxf_ref, bf_ref,
                                   hf_ref[:], whf_ref)
        i_b, f_b, g_b, o_b = gates(xb_ref[0], wxb_ref, bb_ref,
                                   hb_ref[:], whb_ref)

        c_f = f_f * cf_ref[:] + i_f * g_f
        h_f = o_f * jnp.tanh(c_f)
        cf_ref[:] = c_f
        hf_ref[:] = h_f
        ysf_ref[0] = h_f.astype(ysf_ref.dtype)
        csf_ref[0] = c_f

        c_b = f_b * cb_ref[:] + i_b * g_b
        h_b = o_b * jnp.tanh(c_b)
        cb_ref[:] = c_b
        hb_ref[:] = h_b
        ysb_ref[0] = h_b.astype(ysb_ref.dtype)
        csb_ref[0] = c_b

    fwd_ix = lambda bi, t: (t, bi, 0)  # noqa: E731
    bwd_ix = lambda bi, t: (t_len - 1 - t, bi, 0)  # noqa: E731
    w_ix = lambda bi, t: (0, 0)  # noqa: E731
    ys_f, ys_b, cs_f, cs_b = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, d), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, d), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
        ],
        interpret=interpret,
    )(x_tm, x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
    return ys_f, ys_b, cs_f, cs_b


def _bi_layer_backward(x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
                       ys_f, ys_b, cs_f, cs_b, dys_f, dys_b):
    t_len, b, d = x_tm.shape
    h4 = wh_f.shape[1]
    h = h4 // 4
    b_tile = _pick_b_tile_layer_bwd(b, d, h4, x_tm.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # 2 dirs x 5 dots per step: gate recompute (x @ wx + h @ wh),
    # dgates @ wh^T, dgates @ wx^T, x^T @ dgates, h_prev^T @ dgates
    # (strict model bwd = the 4 d-dots; the recompute is implementation)
    _record_flops(2 * 6 * t_len * b * (d + h) * h4,
                  model=2 * 4 * t_len * b * (d + h) * h4)

    def adjoint(x_blk, wx_ref, b_ref, wh_ref, h_prev, c_prev, c_t,
                dy_blk, dh, dc):
        """One direction's adjoint step -> (dx, dh_prev, dc_prev,
        dwx_inc, dwh_inc, db_inc)."""
        g = (
            jnp.dot(x_blk, wx_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0]
            + jnp.dot(
                h_prev.astype(x_blk.dtype),
                wh_ref[:],
                preferred_element_type=jnp.float32,
            )
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        tanh_c = jnp.tanh(c_t)
        dh_total = dy_blk.astype(jnp.float32) + dh
        do = dh_total * tanh_c
        dct = dh_total * o * (1.0 - tanh_c * tanh_c) + dc
        dgi = (dct * gg) * i * (1.0 - i)
        dgf = (dct * c_prev) * f * (1.0 - f)
        dgc = (dct * i) * (1.0 - gg * gg)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgc, dgo], axis=-1)
        dg_lp = dgates.astype(x_blk.dtype)
        dh_prev = jnp.dot(dg_lp, wh_ref[:].T,
                          preferred_element_type=jnp.float32)
        dx = jnp.dot(dg_lp, wx_ref[:].T,
                     preferred_element_type=jnp.float32)
        dwx_inc = jnp.dot(x_blk.T, dg_lp,
                          preferred_element_type=jnp.float32)
        dwh_inc = jnp.dot(h_prev.astype(x_blk.dtype).T, dg_lp,
                          preferred_element_type=jnp.float32)
        db_inc = jnp.sum(dgates, axis=0, keepdims=True)
        return dx, dh_prev, dct * f, dwx_inc, dwh_inc, db_inc

    def kernel(xf_ref, xb_ref, wxf_ref, bf_ref, whf_ref,
               wxb_ref, bb_ref, whb_ref,
               yspf_ref, yspb_ref, cspf_ref, cspb_ref,
               csf_ref, csb_ref, dysf_ref, dysb_ref,
               dxf_ref, dxb_ref, dwxf_ref, dwxb_ref,
               dwhf_ref, dwhb_ref, dbf_ref, dbb_ref,
               dhf, dcf, dhb, dcb,
               dwxf_acc, dwxb_acc, dwhf_acc, dwhb_acc,
               dbf_acc, dbb_acc):
        tr = pl.program_id(1)

        @pl.when(tr == 0)
        def _():
            dhf[:] = jnp.zeros_like(dhf)
            dcf[:] = jnp.zeros_like(dcf)
            dhb[:] = jnp.zeros_like(dhb)
            dcb[:] = jnp.zeros_like(dcb)
            dwxf_acc[:] = jnp.zeros_like(dwxf_acc)
            dwxb_acc[:] = jnp.zeros_like(dwxb_acc)
            dwhf_acc[:] = jnp.zeros_like(dwhf_acc)
            dwhb_acc[:] = jnp.zeros_like(dwhb_acc)
            dbf_acc[:] = jnp.zeros_like(dbf_acc)
            dbb_acc[:] = jnp.zeros_like(dbb_acc)

        is_boundary = tr == t_len - 1
        hp_f = jnp.where(
            is_boundary, jnp.zeros_like(yspf_ref[0]), yspf_ref[0]
        ).astype(jnp.float32)
        cp_f = jnp.where(is_boundary, jnp.zeros_like(cspf_ref[0]),
                         cspf_ref[0])
        hp_b = jnp.where(
            is_boundary, jnp.zeros_like(yspb_ref[0]), yspb_ref[0]
        ).astype(jnp.float32)
        cp_b = jnp.where(is_boundary, jnp.zeros_like(cspb_ref[0]),
                         cspb_ref[0])

        dx_f, dhp_f, dcp_f, dwxi_f, dwhi_f, dbi_f = adjoint(
            xf_ref[0], wxf_ref, bf_ref, whf_ref, hp_f, cp_f,
            csf_ref[0], dysf_ref[0], dhf[:], dcf[:],
        )
        dx_b, dhp_b, dcp_b, dwxi_b, dwhi_b, dbi_b = adjoint(
            xb_ref[0], wxb_ref, bb_ref, whb_ref, hp_b, cp_b,
            csb_ref[0], dysb_ref[0], dhb[:], dcb[:],
        )
        dxf_ref[0] = dx_f.astype(dxf_ref.dtype)
        dhf[:] = dhp_f
        dcf[:] = dcp_f
        dwxf_acc[:] += dwxi_f
        dwhf_acc[:] += dwhi_f
        dbf_acc[:] += dbi_f
        dxb_ref[0] = dx_b.astype(dxb_ref.dtype)
        dhb[:] = dhp_b
        dcb[:] = dcp_b
        dwxb_acc[:] += dwxi_b
        dwhb_acc[:] += dwhi_b
        dbb_acc[:] += dbi_b

        @pl.when(is_boundary)
        def _():
            dwxf_ref[0] = dwxf_acc[:]
            dwxb_ref[0] = dwxb_acc[:]
            dwhf_ref[0] = dwhf_acc[:]
            dwhb_ref[0] = dwhb_acc[:]
            dbf_ref[0] = dbf_acc[:]
            dbb_ref[0] = dbb_acc[:]

    cur_f = lambda bi, tr: (t_len - 1 - tr, bi, 0)  # noqa: E731
    prev_f = lambda bi, tr: (jnp.maximum(t_len - 2 - tr, 0), bi, 0)  # noqa: E731,E501
    cur_b = lambda bi, tr: (tr, bi, 0)  # noqa: E731
    prev_b = lambda bi, tr: (jnp.minimum(tr + 1, t_len - 1), bi, 0)  # noqa: E731,E501
    w_ix = lambda bi, tr: (0, 0)  # noqa: E731
    tile_ix = lambda bi, tr: (bi, 0, 0)  # noqa: E731

    (dx_f, dx_b, dwxf_t, dwxb_t, dwhf_t, dwhb_t,
     dbf_t, dbb_t) = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, d), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, d), x_tm.dtype),
            jax.ShapeDtypeStruct((nb, d, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, d, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, b_tile, d), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, d), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, d), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, d), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), tile_ix, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((d, h4), jnp.float32),
            pltpu.VMEM((d, h4), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
        ],
        interpret=interpret,
    )(x_tm, x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
      ys_f, ys_b, cs_f, cs_b, cs_f, cs_b, dys_f, dys_b)
    return (
        dx_f, dx_b,
        jnp.sum(dwxf_t, axis=0), jnp.sum(dwxb_t, axis=0),
        jnp.sum(dwhf_t, axis=0), jnp.sum(dwhb_t, axis=0),
        jnp.sum(dbf_t, axis=(0, 1)), jnp.sum(dbb_t, axis=(0, 1)),
    )


@jax.custom_vjp
def bilstm_layer(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    """Fully-fused bidirectional LSTM layer -> [B, T, 2H].

    Both directions' recurrences AND their input projections run inside
    one Pallas kernel; the backward computes dx/dWx/dWh/db in kernel too.
    Nothing 4H-wide ever reaches HBM (see the section comment above).
    Residual policy matches bilstm_fused: saves (x, ys, cs) only.
    """
    ys, _ = _bi_layer_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
    return ys


def _bi_layer_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    x_tm = jnp.swapaxes(x, 0, 1)
    cast = lambda w: w.astype(x.dtype)  # noqa: E731
    ys_f, ys_b, cs_f, cs_b = _bi_layer_forward(
        x_tm, cast(wx_f), b_f.astype(jnp.float32).reshape(1, -1),
        cast(wh_f), cast(wx_b), b_b.astype(jnp.float32).reshape(1, -1),
        cast(wh_b),
    )
    ys = jnp.concatenate(
        [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)], axis=-1
    )
    return ys, (x_tm, ys_f, ys_b, cs_f, cs_b)


def _bi_layer_fwd(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b):
    ys, (x_tm, ys_f, ys_b, cs_f, cs_b) = _bi_layer_fwd_impl(
        x, wx_f, b_f, wh_f, wx_b, b_b, wh_b
    )
    return ys, (x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
                ys_f, ys_b, cs_f, cs_b)


def _bi_layer_bwd(res, dys):
    (x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
     ys_f, ys_b, cs_f, cs_b) = res
    h = wh_f.shape[0]
    dt = x_tm.dtype
    cast = lambda w: w.astype(dt)  # noqa: E731
    dys_f = jnp.swapaxes(dys[..., :h], 0, 1).astype(dt)
    dys_b = jnp.swapaxes(dys[..., h:], 0, 1).astype(dt)
    (dx_f, dx_b, dwx_f, dwx_b, dwh_f, dwh_b, db_f, db_b) = (
        _bi_layer_backward(
            x_tm, cast(wx_f), b_f.astype(jnp.float32).reshape(1, -1),
            cast(wh_f), cast(wx_b),
            b_b.astype(jnp.float32).reshape(1, -1), cast(wh_b),
            ys_f, ys_b, cs_f, cs_b, dys_f, dys_b,
        )
    )
    dx = jnp.swapaxes(dx_f + dx_b, 0, 1)
    return (
        dx,
        dwx_f.astype(wx_f.dtype),
        db_f.astype(b_f.dtype),
        dwh_f.astype(wh_f.dtype),
        dwx_b.astype(wx_b.dtype),
        db_b.astype(b_b.dtype),
        dwh_b.astype(wh_b.dtype),
    )


bilstm_layer.defvjp(_bi_layer_fwd, _bi_layer_bwd)


# ---- unfold-fused layer kernel (TF-GridNet fold boundaries) -----------------
#
# The GridNet rnn branches (reference gridnet_block.py:139-186) wrap each
# BiLSTM in unfold(emb_ks, emb_hs) / deconv1d fold boundaries. Feeding
# bilstm_layer the pre-unfolded stream materializes a ks-times-wider
# [T', B, ks*C] tensor in HBM (plus its time-major transpose, plus its
# 4x-bigger residual for backward). The variant below consumes the RAW
# [L, B, C] stream instead: each direction reads ks shifted views of x
# via ks block-index maps (frame t tap k = row t*hs + k), and the input
# projection becomes ks small [b, C] @ [C, 4H] dots summed in-kernel —
# sequence-independent work that pipelines into the recurrence's VPU
# bubble exactly like the layer kernel's single big x-dot. The unfolded
# stream never exists; residuals shrink ks-fold. The backward recomputes
# gates from the same shifted taps, accumulates dW per tap in VMEM, and
# streams the unfolded cotangent dxu = dgates @ Wx^T ([T', B, ks*C]);
# the caller folds it back with ks static shift-adds (cheap XLA
# elementwise).
#
# Weight layout: callers keep the checkpoint/torch-port layout
# wx [ks*C, 4H] with CHANNEL-major rows (c*ks + k, torch F.unfold order);
# the wrapper permutes to tap-major [ks, C, 4H] before the kernel and
# permutes dwx back.


def _pick_b_tile_unfold_fwd(b, c, ks, h4, dtype):
    """Per tile row: x taps (2 dirs, ks streams, dbl, lane-padded C) +
    ys/cs out (2 dirs, dbl) + state scratch + gate temporaries;
    fixed: tap-major wx + wh for both dirs."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    c_pad = max(c, 128)
    per_row = 2 * ks * 2 * c_pad * s + 4 * h * s + 16 * h + 16 * h + 8 * h4
    fixed = 2 * (ks * c + h) * h4 * s
    return _fit_tile(b, per_row, fixed, _MAX_TILE_ROWS_BWD[s])


def _pick_b_tile_unfold_bwd(b, c, ks, h4, dtype):
    """Adds dxu out (2 dirs, dbl, ks*C) + adjoint scratch + f32 dW
    accumulators/outputs."""
    s = 2 if dtype == jnp.bfloat16 else 4
    h = h4 // 4
    c_pad = max(c, 128)
    per_row = (2 * ks * 2 * c_pad * s + 4 * ks * c * s + 4 * h * s
               + 32 * h + 4 * h * s + 16 * h + 8 * h4)
    fixed = 2 * (ks * c + h) * h4 * s + 4 * (ks * c + h) * h4 * 4
    return _fit_tile(b, per_row, fixed, _MAX_TILE_ROWS_BWD[s])


def _bi_unfold_forward(x_tm, wxp_f, b_f, wh_f, wxp_b, b_b, wh_b, ks, hs):
    """x_tm: [L, B, C]; wxp_*: [ks, C, 4H] tap-major; biases [1, 4H]
    -> (ys_f, ys_b, cs_f, cs_b) each [T', B, H]."""
    l_len, b, c = x_tm.shape
    h4 = wh_f.shape[1]
    h = h4 // 4
    t_len = (l_len - ks) // hs + 1
    b_tile = _pick_b_tile_unfold_fwd(b, c, ks, h4, x_tm.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # 2 dirs x (ks taps @ wxp + h @ wh) per step
    _record_flops(2 * 2 * t_len * b * (ks * c + h) * h4)

    def gates(x_blks, wxp_ref, b_ref, h_state, wh_ref):
        # concat the ks taps (VPU lane shuffle) and run ONE [b, ks*C]
        # dot: ks separate 48-deep dots measured ~30% slower kernels
        # (narrow contractions waste the 128-deep MXU)
        xcat = jnp.concatenate([x_blks[k][0] for k in range(ks)], axis=-1)
        g = (
            b_ref[0]
            + jnp.dot(xcat, wxp_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(
                h_state.astype(xcat.dtype),
                wh_ref[:],
                preferred_element_type=jnp.float32,
            )
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        return i, f, gg, o

    def kernel(*refs):
        xf = refs[0:ks]
        xb = refs[ks:2 * ks]
        (wxf_ref, bf_ref, whf_ref, wxb_ref, bb_ref, whb_ref,
         ysf_ref, ysb_ref, csf_ref, csb_ref,
         hf_ref, cf_ref, hb_ref, cb_ref) = refs[2 * ks:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            cf_ref[:] = jnp.zeros_like(cf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)
            cb_ref[:] = jnp.zeros_like(cb_ref)

        i_f, f_f, g_f, o_f = gates(xf, wxf_ref, bf_ref, hf_ref[:], whf_ref)
        i_b, f_b, g_b, o_b = gates(xb, wxb_ref, bb_ref, hb_ref[:], whb_ref)

        c_f = f_f * cf_ref[:] + i_f * g_f
        h_f = o_f * jnp.tanh(c_f)
        cf_ref[:] = c_f
        hf_ref[:] = h_f
        ysf_ref[0] = h_f.astype(ysf_ref.dtype)
        csf_ref[0] = c_f

        c_b = f_b * cb_ref[:] + i_b * g_b
        h_b = o_b * jnp.tanh(c_b)
        cb_ref[:] = c_b
        hb_ref[:] = h_b
        ysb_ref[0] = h_b.astype(ysb_ref.dtype)
        csb_ref[0] = c_b

    def tap_f(k):
        return lambda bi, t: (t * hs + k, bi, 0)

    def tap_b(k):
        return lambda bi, t: ((t_len - 1 - t) * hs + k, bi, 0)

    fwd_ix = lambda bi, t: (t, bi, 0)  # noqa: E731
    bwd_ix = lambda bi, t: (t_len - 1 - t, bi, 0)  # noqa: E731
    w_ix = lambda bi, t: (0, 0)  # noqa: E731
    x_spec_f = [
        pl.BlockSpec((1, b_tile, c), tap_f(k), memory_space=pltpu.VMEM)
        for k in range(ks)
    ]
    x_spec_b = [
        pl.BlockSpec((1, b_tile, c), tap_b(k), memory_space=pltpu.VMEM)
        for k in range(ks)
    ]
    ys_f, ys_b, cs_f, cs_b = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b, h), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=x_spec_f + x_spec_b + [
            pl.BlockSpec((ks * c, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ks * c, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), bwd_ix, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
        ],
        interpret=interpret,
    )(*([x_tm] * (2 * ks)), wxp_f.reshape(ks * c, h4), b_f, wh_f,
      wxp_b.reshape(ks * c, h4), b_b, wh_b)
    return ys_f, ys_b, cs_f, cs_b


def _bi_unfold_backward(x_tm, wxp_f, b_f, wh_f, wxp_b, b_b, wh_b,
                        ys_f, ys_b, cs_f, cs_b, dys_f, dys_b, ks, hs):
    l_len, b, c = x_tm.shape
    h4 = wh_f.shape[1]
    h = h4 // 4
    t_len = (l_len - ks) // hs + 1
    b_tile = _pick_b_tile_unfold_bwd(b, c, ks, h4, x_tm.dtype)
    nb = b // b_tile
    interpret = not pallas_available()
    # executed: gate recompute + dgates@wh^T + dgates@wx^T + per-tap dW
    # + dwh (6 dot-units over d+h); strict model bwd excludes the
    # recompute (4 units)
    _record_flops(2 * 6 * t_len * b * (ks * c + h) * h4,
                  model=2 * 4 * t_len * b * (ks * c + h) * h4)

    def adjoint(x_blks, wxflat_ref, b_ref, wh_ref,
                h_prev, c_prev, c_t, dy_blk, dh, dc):
        xcat = jnp.concatenate([x_blks[k][0] for k in range(ks)], axis=-1)
        g = (
            b_ref[0]
            + jnp.dot(xcat, wxflat_ref[:],
                      preferred_element_type=jnp.float32)
            + jnp.dot(
                h_prev.astype(xcat.dtype),
                wh_ref[:],
                preferred_element_type=jnp.float32,
            )
        )
        i = jax.nn.sigmoid(g[:, :h])
        f = jax.nn.sigmoid(g[:, h:2 * h])
        gg = jnp.tanh(g[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(g[:, 3 * h:])
        tanh_c = jnp.tanh(c_t)
        dh_total = dy_blk.astype(jnp.float32) + dh
        do = dh_total * tanh_c
        dct = dh_total * o * (1.0 - tanh_c * tanh_c) + dc
        dgi = (dct * gg) * i * (1.0 - i)
        dgf = (dct * c_prev) * f * (1.0 - f)
        dgc = (dct * i) * (1.0 - gg * gg)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgc, dgo], axis=-1)
        dg_lp = dgates.astype(x_blks[0].dtype)
        dh_prev = jnp.dot(dg_lp, wh_ref[:].T,
                          preferred_element_type=jnp.float32)
        dxu = jnp.dot(dg_lp, wxflat_ref[:].T,
                      preferred_element_type=jnp.float32)
        dwx_inc = jnp.dot(xcat.T, dg_lp,
                          preferred_element_type=jnp.float32)
        dwh_inc = jnp.dot(h_prev.astype(xcat.dtype).T, dg_lp,
                          preferred_element_type=jnp.float32)
        db_inc = jnp.sum(dgates, axis=0, keepdims=True)
        return dxu, dh_prev, dct * f, dwx_inc, dwh_inc, db_inc

    def kernel(*refs):
        xf = refs[0:ks]
        xb = refs[ks:2 * ks]
        (wxflatf_ref, bf_ref, whf_ref,
         wxflatb_ref, bb_ref, whb_ref,
         yspf_ref, yspb_ref, cspf_ref, cspb_ref,
         csf_ref, csb_ref, dysf_ref, dysb_ref,
         dxuf_ref, dxub_ref, dwxf_ref, dwxb_ref,
         dwhf_ref, dwhb_ref, dbf_ref, dbb_ref,
         dhf, dcf, dhb, dcb,
         dwxf_acc, dwxb_acc, dwhf_acc, dwhb_acc,
         dbf_acc, dbb_acc) = refs[2 * ks:]
        tr = pl.program_id(1)

        @pl.when(tr == 0)
        def _():
            dhf[:] = jnp.zeros_like(dhf)
            dcf[:] = jnp.zeros_like(dcf)
            dhb[:] = jnp.zeros_like(dhb)
            dcb[:] = jnp.zeros_like(dcb)
            dwxf_acc[:] = jnp.zeros_like(dwxf_acc)
            dwxb_acc[:] = jnp.zeros_like(dwxb_acc)
            dwhf_acc[:] = jnp.zeros_like(dwhf_acc)
            dwhb_acc[:] = jnp.zeros_like(dwhb_acc)
            dbf_acc[:] = jnp.zeros_like(dbf_acc)
            dbb_acc[:] = jnp.zeros_like(dbb_acc)

        is_boundary = tr == t_len - 1
        hp_f = jnp.where(
            is_boundary, jnp.zeros_like(yspf_ref[0]), yspf_ref[0]
        ).astype(jnp.float32)
        cp_f = jnp.where(is_boundary, jnp.zeros_like(cspf_ref[0]),
                         cspf_ref[0])
        hp_b = jnp.where(
            is_boundary, jnp.zeros_like(yspb_ref[0]), yspb_ref[0]
        ).astype(jnp.float32)
        cp_b = jnp.where(is_boundary, jnp.zeros_like(cspb_ref[0]),
                         cspb_ref[0])

        dxu_f, dhp_f, dcp_f, dwxi_f, dwhi_f, dbi_f = adjoint(
            xf, wxflatf_ref, bf_ref, whf_ref, hp_f, cp_f,
            csf_ref[0], dysf_ref[0], dhf[:], dcf[:],
        )
        dxu_b, dhp_b, dcp_b, dwxi_b, dwhi_b, dbi_b = adjoint(
            xb, wxflatb_ref, bb_ref, whb_ref, hp_b, cp_b,
            csb_ref[0], dysb_ref[0], dhb[:], dcb[:],
        )
        dxuf_ref[0] = dxu_f.astype(dxuf_ref.dtype)
        dhf[:] = dhp_f
        dcf[:] = dcp_f
        dwxf_acc[:] += dwxi_f
        dwhf_acc[:] += dwhi_f
        dbf_acc[:] += dbi_f
        dxub_ref[0] = dxu_b.astype(dxub_ref.dtype)
        dhb[:] = dhp_b
        dcb[:] = dcp_b
        dwxb_acc[:] += dwxi_b
        dwhb_acc[:] += dwhi_b
        dbb_acc[:] += dbi_b

        @pl.when(is_boundary)
        def _():
            dwxf_ref[0] = dwxf_acc[:]
            dwxb_ref[0] = dwxb_acc[:]
            dwhf_ref[0] = dwhf_acc[:]
            dwhb_ref[0] = dwhb_acc[:]
            dbf_ref[0] = dbf_acc[:]
            dbb_ref[0] = dbb_acc[:]

    def tapr_f(k):
        return lambda bi, tr: ((t_len - 1 - tr) * hs + k, bi, 0)

    def tapr_b(k):
        return lambda bi, tr: (tr * hs + k, bi, 0)

    cur_f = lambda bi, tr: (t_len - 1 - tr, bi, 0)  # noqa: E731
    prev_f = lambda bi, tr: (jnp.maximum(t_len - 2 - tr, 0), bi, 0)  # noqa: E731,E501
    cur_b = lambda bi, tr: (tr, bi, 0)  # noqa: E731
    prev_b = lambda bi, tr: (jnp.minimum(tr + 1, t_len - 1), bi, 0)  # noqa: E731,E501
    w_ix = lambda bi, tr: (0, 0)  # noqa: E731
    tile_ix = lambda bi, tr: (bi, 0, 0)  # noqa: E731
    x_spec_f = [
        pl.BlockSpec((1, b_tile, c), tapr_f(k), memory_space=pltpu.VMEM)
        for k in range(ks)
    ]
    x_spec_b = [
        pl.BlockSpec((1, b_tile, c), tapr_b(k), memory_space=pltpu.VMEM)
        for k in range(ks)
    ]
    wxflat_f = wxp_f.reshape(ks * c, h4)
    wxflat_b = wxp_b.reshape(ks * c, h4)

    (dxu_f, dxu_b, dwxf_t, dwxb_t, dwhf_t, dwhb_t,
     dbf_t, dbb_t) = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, ks * c), x_tm.dtype),
            jax.ShapeDtypeStruct((t_len, b, ks * c), x_tm.dtype),
            jax.ShapeDtypeStruct((nb, ks * c, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, ks * c, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h4), jnp.float32),
        ),
        grid=(nb, t_len),
        in_specs=x_spec_f + x_spec_b + [
            pl.BlockSpec((ks * c, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ks * c, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, h), cur_b, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, ks * c), cur_f,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, ks * c), cur_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ks * c, h4), tile_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ks * c, h4), tile_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4), tile_ix, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((ks * c, h4), jnp.float32),
            pltpu.VMEM((ks * c, h4), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
            pltpu.VMEM((1, h4), jnp.float32),
        ],
        interpret=interpret,
    )(*([x_tm] * (2 * ks)), wxflat_f, b_f, wh_f,
      wxflat_b, b_b, wh_b,
      ys_f, ys_b, cs_f, cs_b, cs_f, cs_b, dys_f, dys_b)
    return (
        dxu_f, dxu_b,
        jnp.sum(dwxf_t, axis=0), jnp.sum(dwxb_t, axis=0),
        jnp.sum(dwhf_t, axis=0), jnp.sum(dwhb_t, axis=0),
        jnp.sum(dbf_t, axis=(0, 1)), jnp.sum(dbb_t, axis=(0, 1)),
    )


def _permute_tap_major(wx, ks):
    """[ks*C (channel-major c*ks+k), 4H] -> [ks, C, 4H] tap-major."""
    d, h4 = wx.shape
    c = d // ks
    return wx.reshape(c, ks, h4).transpose(1, 0, 2)


def _fold_dxu(dxu, ks, hs, l_len):
    """Fold the unfolded cotangent [B, T', ks*C] (tap-major) back to
    [B, L, C]: dx[l] = sum_k dxu[t, k] where l = t*hs + k."""
    b, t_len, kc = dxu.shape
    c = kc // ks
    dxu = dxu.reshape(b, t_len, ks, c)
    dx = jnp.zeros((b, l_len, c), dxu.dtype)
    for k in range(ks):
        dx = dx.at[:, k:k + hs * t_len:hs].add(dxu[:, :, k])
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def bilstm_layer_unfold(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ks, hs):
    """Unfold(ks, hs) + bidirectional LSTM as ONE fused layer kernel.

    x: [B, L, C]; wx_*: [ks*C, 4H] in torch F.unfold channel-major row
    order (c*ks + k) — identical to feeding bilstm_layer the unfolded
    stream, but the [T', B, ks*C] unfolded tensor never exists in HBM.
    Returns [B, T', 2H] with T' = (L - ks)//hs + 1.
    """
    ys, _ = _bi_unfold_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
                                ks, hs)
    return ys


def _bi_unfold_fwd_impl(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ks, hs):
    x_tm = jnp.swapaxes(x, 0, 1)
    cast = lambda w: w.astype(x.dtype)  # noqa: E731
    wxp_f = _permute_tap_major(cast(wx_f), ks)
    wxp_b = _permute_tap_major(cast(wx_b), ks)
    ys_f, ys_b, cs_f, cs_b = _bi_unfold_forward(
        x_tm, wxp_f, b_f.astype(jnp.float32).reshape(1, -1), cast(wh_f),
        wxp_b, b_b.astype(jnp.float32).reshape(1, -1), cast(wh_b),
        ks, hs,
    )
    ys = jnp.concatenate(
        [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)], axis=-1
    )
    return ys, (x_tm, ys_f, ys_b, cs_f, cs_b)


def _bi_unfold_fwd(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ks, hs):
    ys, (x_tm, ys_f, ys_b, cs_f, cs_b) = _bi_unfold_fwd_impl(
        x, wx_f, b_f, wh_f, wx_b, b_b, wh_b, ks, hs
    )
    return ys, (x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
                ys_f, ys_b, cs_f, cs_b)


def _bi_unfold_bwd(ks, hs, res, dys):
    (x_tm, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
     ys_f, ys_b, cs_f, cs_b) = res
    h = wh_f.shape[0]
    dt = x_tm.dtype
    cast = lambda w: w.astype(dt)  # noqa: E731
    wxp_f = _permute_tap_major(cast(wx_f), ks)
    wxp_b = _permute_tap_major(cast(wx_b), ks)
    dys_f = jnp.swapaxes(dys[..., :h], 0, 1).astype(dt)
    dys_b = jnp.swapaxes(dys[..., h:], 0, 1).astype(dt)
    (dxu_f, dxu_b, dwxp_f, dwxp_b, dwh_f, dwh_b, db_f, db_b) = (
        _bi_unfold_backward(
            x_tm, wxp_f, b_f.astype(jnp.float32).reshape(1, -1),
            cast(wh_f), wxp_b, b_b.astype(jnp.float32).reshape(1, -1),
            cast(wh_b), ys_f, ys_b, cs_f, cs_b, dys_f, dys_b, ks, hs,
        )
    )
    l_len = x_tm.shape[0]
    dxu = jnp.swapaxes(dxu_f + dxu_b, 0, 1)  # [B, T', ks*C]
    dx = _fold_dxu(dxu, ks, hs, l_len)

    def unpermute(dwxp):
        kc, h4 = dwxp.shape
        c = kc // ks
        return dwxp.reshape(ks, c, h4).transpose(1, 0, 2).reshape(kc, h4)

    return (
        dx,
        unpermute(dwxp_f).astype(wx_f.dtype),
        db_f.astype(b_f.dtype),
        dwh_f.astype(wh_f.dtype),
        unpermute(dwxp_b).astype(wx_b.dtype),
        db_b.astype(b_b.dtype),
        dwh_b.astype(wh_b.dtype),
    )


bilstm_layer_unfold.defvjp(_bi_unfold_fwd, _bi_unfold_bwd)
