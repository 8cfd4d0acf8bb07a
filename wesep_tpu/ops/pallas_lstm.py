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

__all__ = ["lstm_pallas", "pallas_available"]


def pallas_available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _pick_b_tile(b: int, h4: int, dtype) -> int:
    """Largest batch tile (multiple of 8) that keeps the backward kernel's
    working set inside VMEM.

    Per tile the backward holds ~2 double-buffered [tile, 4H] streams
    (xw, dxw) + 6 [tile, H] blocks + f32 scratch — the dominant term is
    ~6 * tile * 4H * bytes; budget it at ~10MB of the 16MB VMEM."""
    bytes_per = 2 if dtype == jnp.bfloat16 else 4
    budget = 10 * 1024 * 1024
    tile = max(budget // (6 * h4 * max(bytes_per, 4)), 8)
    tile = (tile // 8) * 8
    tile = min(tile, b)
    while tile > 1 and b % tile:
        tile -= 8 if tile > 8 else 1
    return max(tile, 1)


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
    xw, wh, ys, cs = res
    t_len, b, h4 = xw.shape
    h = h4 // 4
    b_tile = _pick_b_tile(b, h4, xw.dtype)
    nb = b // b_tile
    interpret = not pallas_available()

    def kernel(xw_ref, wh_ref, ysp_ref, csp_ref, cs_ref, dys_ref,
               dxw_ref, dwh_ref, dh_ref, dc_ref, dwh_acc):
        tr = pl.program_id(1)  # adjoint walk: 0 .. T-1 (reverse of scan)

        @pl.when(tr == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dc_ref[:] = jnp.zeros_like(dc_ref)
            dwh_acc[:] = jnp.zeros_like(dwh_acc)

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

        @pl.when(is_boundary)
        def _():
            dwh_ref[0] = dwh_acc[:]

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

    dxw, dwh_tiles = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, h4), xw.dtype),
            jax.ShapeDtypeStruct((nb, h, h4), jnp.float32),
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
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((b_tile, h), jnp.float32),
            pltpu.VMEM((h, h4), jnp.float32),
        ],
        interpret=interpret,
    )(xw, wh, ys, cs, cs, dys)
    return dxw, jnp.sum(dwh_tiles, axis=0).astype(wh.dtype)


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
    dxw, dwh = _bwd(reverse, (xw, wh.astype(x.dtype), ys_tm, cs), dys_tm)
    dxw_bm = jnp.swapaxes(dxw, 0, 1)  # [B, T, 4H]
    dx = jnp.einsum(
        "bth,dh->btd", dxw_bm, wx.astype(dxw_bm.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dwx = jnp.einsum(
        "btd,bth->dh", x, dxw_bm, preferred_element_type=jnp.float32
    ).astype(wx.dtype)
    db = jnp.sum(dxw_bm.astype(jnp.float32), axis=(0, 1)).astype(b.dtype)
    return dx, dwx, db, dwh.astype(wh.dtype)


lstm_fused.defvjp(_fused_fwd, _fused_bwd)
