"""Fused Pallas TCN block for SpEx+ (VERDICT r3/r4 #2).

The SpEx+ separator is 32 TCN blocks over [B, T'~4799, 512] streams and
is HBM-bound: the round-4 xplane attribution (BASELINE.md) shows ~27%
of the 70 ms step in gLN scalar-stats reductions and ~14% in big-stream
elementwise passes, each reading a full [8, 4799, 512] bf16 stream.
Reference block: /root/reference/wesep/modules/tasnet/convs.py:43-104
(1x1 -> PReLU -> gLN -> depthwise dilated conv -> PReLU -> gLN -> 1x1,
residual).

This kernel computes the WHOLE block per batch sample with the
intermediate stream resident in VMEM, so HBM sees only:

    fwd:  read x [T, C], write y [T, C]           (2 narrow passes)
    bwd:  read x, dy; write dx (+ weight grads)   (3 narrow passes)

versus the XLA path's ~6-8 wide [T, H] round-trips per block. gLN needs
two sequential GLOBAL reductions (stats0 before the dconv's input is
known, stats1 before the output 1x1), so the kernel runs phased grid
passes over T-chunks — grid (B, phase, nT) with the raw bottleneck
stream u = PReLU(x@W1 + b1) held in a per-batch VMEM scratch and the
scalar stats carried in SMEM between phases:

    fwd   p0: u -> u_s, accumulate gLN0 sums
          p1: recompute n0/v/w from u_s taps, accumulate gLN1 sums,
              output q = (g1w*w) @ W2; the scalar combine
              y = x + rs1*q + (c1 @ W2 + b2) is ONE fused XLA
              elementwise pass outside the kernel (r5: removed the old
              all-elementwise phase 2 sweep)
    bwd   P0: recompute u -> u_s, zero the dn0 scatter scratch;
              LAGGED (chunk i-1) gLN1-bwd: dn1 = dy @ W2^T, sums +
              dW2/db2/dg1/dbe1 (u taps of chunk j complete once
              chunk j+1's u is stored, pad_hi < rc)
          P1: dw -> dv; dp1/dkd/dbd; scatter dn0_s += kd[k] * dv;
              LAGGED (chunk i-1) gLN0-bwd sums from dn0_s and u_s
              (dn0 rows of chunk j complete once chunk j+1 scattered,
              pad_lo < rc)
          P2: du -> ds; dx = dy + ds @ W1^T; dW1/db1/dp0
    (r5: 5 sweeps -> 3 via one-chunk-lag merges; the two global
    reductions set the sweep floor)

The depthwise conv is 3 shifted VMEM gathers (zero-pad semantics via
row-validity masks — u_s holds RAW u, n0 = a0*u + c0 is formed on the
fly and masked to 0 outside [0, T)); the backward transposes it as a
scatter-accumulate into a margin-padded scratch so no halo DMA is ever
needed. Speaker-fused blocks (Conv1DBlock4Fuse, convs.py:107-160) use
the same kernel: concat([x, e]) @ W1 == x @ W1x + e @ W1e, so the
embedding contribution folds into a per-batch effective bias b1_eff.

Stats and all reductions accumulate in f32 (sums taken over the
compute-dtype stream, matching the XLA path); matmuls run in the
compute dtype on the MXU with f32 accumulation. Per-chunk tiles are
512 rows (bf16 sublane-aligned, under the proven Mosaic caps of
ops/pallas_lstm.py).

Gating: models/convtasnet.py routes TCNBlock/FuseTCNBlock here when
norm == 'gLN', no skip connection, and Pallas is available
(WESEP_TCN_PALLAS=0 disables). Exact-parity tests:
tests/test_pallas_tcn.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wesep_tpu.ops.pallas_lstm import _record_flops, pallas_available

__all__ = ["tcn_block_gln", "pallas_available"]

import os

# chunk rows: bf16 sublane-aligned. The v5e scoped-VMEM COMPILER
# default is 16 MB but the physical VMEM is larger — the bwd kernel
# raises its cap to 27 MB (CompilerParams.vmem_limit_bytes; verified
# compiling AND running on chip), which unlocks 1024-row chunks for
# both kernels (u_s + dn0_s scratch ~11 MB + chunk working set).
# Sweep history at the SpEx+ envelope: fwd 512->1024 +1 ms/step;
# bwd 5-sweep@512 51.2 ms, 4-sweep@512 51.8, 3-sweep@512 50.8,
# 3-sweep@1024 50.1. Env overrides for chunk-size studies
# (WESEP_TCN_RC_FWD / WESEP_TCN_RC_BWD).
_RC_FWD = int(os.environ.get("WESEP_TCN_RC_FWD", "1024"))
_RC_BWD = int(os.environ.get("WESEP_TCN_RC_BWD", "1024"))


def _ceil_to(x, m):
    return -(-x // m) * m


def _valid(rows0, shift, t_len, rc):
    """[rc, 1] bool: absolute stream row (rows0 + r + shift) in [0, T)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0) + (rows0 + shift)
    return (r >= 0) & (r < t_len)


def _prelu(x, p):
    # compare in f32: the v5e VPU has no bf16 compare ("Target does not
    # support this comparison"); the arithmetic stays in x.dtype
    return jnp.where(x.astype(jnp.float32) >= 0, x, p * x)


def _load_shifted(ref, base, shift, rc):
    """ref[base+shift : base+shift+rc] where base is sublane-aligned but
    the STATIC shift is not: Mosaic requires provably mult-of-8 dynamic
    slice starts, so load an aligned rc+8 window and shift in-register
    (static value slice = a sublane rotate)."""
    lo = (shift // 8) * 8
    delta = shift - lo
    win = ref[pl.ds(base + lo, rc + 8), :]
    return jax.lax.slice_in_dim(win, delta, delta + rc, axis=0)


def _accum_shifted(ref, base, shift, val, rc):
    """ref[base+shift : +rc] += val with an unaligned static shift:
    aligned read-modify-write of the covering rc+8 window, with val
    placed at the static in-window offset by a pad."""
    lo = (shift // 8) * 8
    delta = shift - lo
    win = ref[pl.ds(base + lo, rc + 8), :]
    contrib = jnp.pad(val, ((delta, 8 - delta), (0, 0)))
    ref[pl.ds(base + lo, rc + 8), :] = win + contrib


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_ref, scal_ref, b1_ref, w1_ref, kd_ref, bd_ref, g0w_ref, g0b_ref,
    g1w_ref, g1b_ref, w2_ref, b2_ref,
    y_ref, stats_ref,
    u_s, acc_s,
    *, t_len, n_chunks, k, dilation, pad_lo, off, eps, cdt, rc,
):
    p_id = pl.program_id(1)
    i = pl.program_id(2)
    rows0 = i * rc
    p0 = scal_ref[0, 0]
    p1 = scal_ref[0, 1]
    nhw = jnp.float32(t_len * w1_ref.shape[1])

    def n0_tap(kk, a0, c0):
        """Masked normalized-stream tap k for center rows [rows0, +RC).
        Elementwise math stays in the compute dtype (bf16 VPU is 2x
        f32, and this matches the XLA path's bf16 streams)."""
        shift = kk * dilation - pad_lo
        u = _load_shifted(u_s, off + rows0, shift, rc)
        n0 = a0.astype(cdt) * u + c0.astype(cdt)
        return jnp.where(_valid(rows0, shift, t_len, rc), n0,
                         jnp.zeros((), cdt))

    def vw(a0, c0):
        v = bd_ref[0, :].astype(cdt)
        for kk in range(k):
            v = v + kd_ref[kk, :] * n0_tap(kk, a0, c0)
        return _prelu(v, p1.astype(cdt))

    def affine0():
        mu0 = stats_ref[0, 0, 0]
        rs0 = stats_ref[0, 0, 1]
        a0 = g0w_ref[0, :] * rs0
        c0 = g0b_ref[0, :] - mu0 * a0
        return a0, c0

    @pl.when(p_id == 0)
    def _phase0():
        @pl.when(i == 0)
        def _():
            acc_s[0] = 0.0
            acc_s[1] = 0.0
            # zero the halo margins once per batch
            u_s[pl.ds(0, off), :] = jnp.zeros((off, u_s.shape[1]), cdt)
            tail = u_s.shape[0] - off - n_chunks * rc
            u_s[pl.ds(off + n_chunks * rc, tail), :] = jnp.zeros(
                (tail, u_s.shape[1]), cdt
            )

        xc = x_ref[0]
        s_mm = jnp.dot(
            xc, w1_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[0, 0, :]
        u = _prelu(s_mm, p0)
        u = jnp.where(_valid(rows0, 0, t_len, rc), u, 0.0).astype(cdt)
        u_s[pl.ds(off + rows0, rc), :] = u
        uf = u.astype(jnp.float32)
        acc_s[0] += jnp.sum(uf)
        acc_s[1] += jnp.sum(uf * uf)

        @pl.when(i == n_chunks - 1)
        def _():
            mu = acc_s[0] / nhw
            var = jnp.maximum(acc_s[1] / nhw - mu * mu, 0.0)
            stats_ref[0, 0, 0] = mu
            stats_ref[0, 0, 1] = jax.lax.rsqrt(var + eps)
            acc_s[2] = 0.0
            acc_s[3] = 0.0

    @pl.when(p_id == 1)
    def _phase1():
        # a1 = g1w * rs1 with rs1 a per-batch SCALAR, so the output
        # matmul distributes: (a1*w) @ W2 == rs1 * ((g1w*w) @ W2).
        # q = (g1w*w) @ W2 needs no stats -> it IS the kernel output;
        # the trivial combine y = x + rs1*q + (c1 @ W2 + b2) runs as a
        # fused XLA elementwise pass outside (r5: dropping the old
        # all-elementwise phase 2 removes a whole grid sweep per block
        # and frees the q_s scratch).
        a0, c0 = affine0()
        w = vw(a0, c0)
        w = jnp.where(_valid(rows0, 0, t_len, rc), w, jnp.zeros((), cdt))
        wf = w.astype(jnp.float32)
        acc_s[2] += jnp.sum(wf)
        acc_s[3] += jnp.sum(wf * wf)
        q = jnp.dot(
            g1w_ref[0, :].astype(cdt) * w, w2_ref[:],
            preferred_element_type=jnp.float32,
        )
        y_ref[0] = q.astype(cdt)

        @pl.when(i == n_chunks - 1)
        def _():
            mu = acc_s[2] / nhw
            var = jnp.maximum(acc_s[3] / nhw - mu * mu, 0.0)
            stats_ref[0, 0, 2] = mu
            stats_ref[0, 0, 3] = jax.lax.rsqrt(var + eps)


def _fwd_call(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
              dilation, k, causal, eps, valid_len=None):
    b, t_len, c = x.shape
    h = w1.shape[1]
    cdt = x.dtype
    rc = _RC_FWD
    if valid_len is not None:
        # pre-padded mode: x is padded to a multiple of rc already
        assert t_len % rc == 0 and valid_len <= t_len, (valid_len, t_len)
        tp, t_len = t_len, valid_len
    else:
        tp = _ceil_to(t_len, rc)
    pad_lo = dilation * (k - 1) if causal else dilation * (k - 1) // 2
    pad_hi = (k - 1) * dilation - pad_lo
    off = _ceil_to(pad_lo + 8, 16)
    pad_t = off + tp + _ceil_to(pad_hi + 16, 16)
    n_chunks = tp // rc
    if valid_len is None and tp != t_len:
        x = jnp.pad(x, ((0, 0), (0, tp - t_len), (0, 0)))
    scal = jnp.stack([p0, p1]).reshape(1, 2).astype(jnp.float32)
    f32 = jnp.float32
    _record_flops(2 * b * t_len * c * h * 2 + b * t_len * h * k * 2)

    grid = (b, 2, n_chunks)
    const = lambda bi, pi, ii: (0, 0)  # noqa: E731
    q, stats = pl.pallas_call(
        functools.partial(
            _fwd_kernel, t_len=t_len, n_chunks=n_chunks, k=k,
            dilation=dilation, pad_lo=pad_lo, off=off, eps=eps, cdt=cdt,
            rc=rc,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rc, c), lambda bi, pi, ii: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rc, c), lambda bi, pi, ii: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, c), cdt),
            jax.ShapeDtypeStruct((b, 1, 4), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((pad_t, h), cdt),
            pltpu.SMEM((4,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=not pallas_available(),
    )(
        x, scal, b1_eff.astype(f32)[:, None, :], w1.astype(cdt), kd.astype(cdt),
        bd.reshape(1, -1).astype(f32), g0w.reshape(1, -1).astype(f32),
        g0b.reshape(1, -1).astype(f32), g1w.reshape(1, -1).astype(f32),
        g1b.reshape(1, -1).astype(f32), w2.astype(cdt),
        b2.reshape(1, -1).astype(f32),
    )
    # y = x + rs1*q + (c1 @ W2 + b2): trivial combine, fused by XLA into
    # one elementwise pass over (x, q) — exact same f32 math as the old
    # in-kernel phase 2
    mu1 = stats[:, 0, 2]
    rs1 = stats[:, 0, 3]
    c1 = (g1b.astype(f32)[None, :]
          - mu1[:, None] * g1w.astype(f32)[None, :] * rs1[:, None])
    corr = jnp.einsum(
        "bh,hc->bc", c1.astype(cdt), w2.astype(cdt),
        preferred_element_type=f32,
    ) + b2.astype(f32)[None, :]
    out_len = tp if valid_len is not None else t_len
    y = (
        x[:, :out_len].astype(f32)
        + rs1[:, None, None] * q[:, :out_len].astype(f32)
        + corr[:, None, :]
    ).astype(cdt)
    return y, stats


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    x_ref, dy_ref, dyp_ref, scal_ref, stats_ref, b1_ref, w1_ref, kd_ref,
    bd_ref, g0w_ref, g0b_ref, g1w_ref, g1b_ref, w2_ref, b2_ref,
    dx_ref, db1e_ref, dw1_ref, dw2_ref, dkd_ref, dbd_ref, dg0_ref,
    dbe0_ref, dg1_ref, dbe1_ref, db2_ref, dscal_ref,
    u_s, dn0_s, acc_s,
    *, t_len, n_chunks, k, dilation, pad_lo, off, off2, eps, cdt, rc,
):
    """3-sweep backward (r5; was 5): the two global gLN-bwd reductions
    set the sweep floor; everything else rides them with one-chunk
    lags — u taps for chunk j are complete once chunk j+1's u is
    stored (pad_hi < rc), and dn0 rows of chunk j are complete once
    chunk j+1 has scattered (pad_lo < rc). Cutting 5 sweeps to 3 also
    cuts per-sweep operand DMA and the duplicate v/w/dn1 recompute
    the old p2 did after p1. Needs the raised scoped-VMEM cap (the
    phase-union stack peaks ~17-25 MB depending on chunk size).

        P0: recompute u -> u_s, zero dn0_s; LAGGED gLN1-bwd work for
            chunk i-1 (dn1 = dy @ W2^T, dW2/db2/dg1/dbe1, acc sums)
        P1: dw -> dv for chunk i; dp1/dkd/dbd; scatter dn0_s; LAGGED
            gLN0-bwd sums for chunk i-1
        P2: du -> ds; dx = dy + ds @ W1^T; dW1/db1/dp0
    """
    b_id = pl.program_id(0)
    p_id = pl.program_id(1)
    i = pl.program_id(2)
    rows0 = i * rc
    p0 = scal_ref[0, 0]
    p1 = scal_ref[0, 1]
    h = w1_ref.shape[1]
    nhw = jnp.float32(t_len * h)
    mu0 = stats_ref[0, 0, 0]
    rs0 = stats_ref[0, 0, 1]
    mu1 = stats_ref[0, 0, 2]
    rs1 = stats_ref[0, 0, 3]
    g0w = g0w_ref[0, :]
    g1w = g1w_ref[0, :]
    a0 = g0w * rs0
    c0 = g0b_ref[0, :] - mu0 * a0
    valid_c = _valid(rows0, 0, t_len, rc)

    def n0_tap(kk, r0):
        shift = kk * dilation - pad_lo
        u = _load_shifted(u_s, off + r0, shift, rc).astype(jnp.float32)
        n0 = a0 * u + c0
        return jnp.where(_valid(r0, shift, t_len, rc), n0, 0.0)

    def v_chunk(r0):
        v = bd_ref[0, :].astype(jnp.float32)
        for kk in range(k):
            v = v + kd_ref[kk, :].astype(jnp.float32) * n0_tap(kk, r0)
        return v

    def w_of(v):
        return _prelu(v, p1).astype(cdt).astype(jnp.float32)

    def dn1_of(dy_blk):
        return jnp.dot(
            dy_blk, w2_ref[:].T, preferred_element_type=jnp.float32
        )

    @pl.when(p_id == 0)
    def _phase0():
        @pl.when((b_id == 0) & (i == 0))
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            dkd_ref[:] = jnp.zeros_like(dkd_ref)
            dbd_ref[:] = jnp.zeros_like(dbd_ref)
            dg0_ref[:] = jnp.zeros_like(dg0_ref)
            dbe0_ref[:] = jnp.zeros_like(dbe0_ref)
            dg1_ref[:] = jnp.zeros_like(dg1_ref)
            dbe1_ref[:] = jnp.zeros_like(dbe1_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dscal_ref[0, 0] = 0.0
            dscal_ref[0, 1] = 0.0

        @pl.when(i == 0)
        def _():
            u_s[pl.ds(0, off), :] = jnp.zeros((off, h), cdt)
            tail = u_s.shape[0] - off - n_chunks * rc
            u_s[pl.ds(off + n_chunks * rc, tail), :] = jnp.zeros(
                (tail, h), cdt
            )
            dn0_s[pl.ds(0, off2), :] = jnp.zeros((off2, h), cdt)
            tail2 = dn0_s.shape[0] - off2 - n_chunks * rc
            dn0_s[pl.ds(off2 + n_chunks * rc, tail2), :] = jnp.zeros(
                (tail2, h), cdt
            )
            db1e_ref[0, 0, :] = jnp.zeros((h,), jnp.float32)
            acc_s[0] = 0.0
            acc_s[1] = 0.0

        s_mm = jnp.dot(
            x_ref[0], w1_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[0, 0, :]
        u = jnp.where(valid_c, _prelu(s_mm, p0), 0.0).astype(cdt)
        u_s[pl.ds(off + rows0, rc), :] = u
        dn0_s[pl.ds(off2 + rows0, rc), :] = jnp.zeros((rc, h), cdt)

        def gln1_work(r0, dy_blk):
            vl = _valid(r0, 0, t_len, rc)
            v = v_chunk(r0)
            w = w_of(v)
            s1hat = jnp.where(vl, (w - mu1) * rs1, 0.0)
            n1 = (g1w * s1hat + g1b_ref[0, :]) * vl
            dn1 = dn1_of(dy_blk)
            dyc = dy_blk.astype(jnp.float32)
            dw2_ref[:] += jnp.dot(
                n1.astype(cdt).T, dy_blk,
                preferred_element_type=jnp.float32,
            )
            db2_ref[0, :] += jnp.sum(dyc, axis=0)
            dg1_ref[0, :] += jnp.sum(dn1 * s1hat, axis=0)
            dbe1_ref[0, :] += jnp.sum(dn1 * vl, axis=0)
            acc_s[0] += jnp.sum(g1w * dn1 * vl)
            acc_s[1] += jnp.sum(g1w * dn1 * s1hat)

        @pl.when(i > 0)
        def _():
            gln1_work(rows0 - rc, dyp_ref[0])

        @pl.when(i == n_chunks - 1)
        def _():
            gln1_work(rows0, dy_ref[0])

    @pl.when(p_id == 1)
    def _phase1s():
        @pl.when(i == 0)
        def _():
            acc_s[2] = 0.0
            acc_s[3] = 0.0

        v = v_chunk(rows0)
        w = w_of(v)
        s1hat = jnp.where(valid_c, (w - mu1) * rs1, 0.0)
        dn1 = dn1_of(dy_ref[0])
        dw = rs1 * (
            g1w * dn1 - acc_s[0] / nhw - s1hat * (acc_s[1] / nhw)
        )
        dw = jnp.where(valid_c, dw, 0.0)
        dscal_ref[0, 1] += jnp.sum(dw * jnp.minimum(v, 0.0))
        dv = dw * jnp.where(v >= 0, 1.0, p1)
        dbd_ref[0, :] += jnp.sum(dv, axis=0)
        dvc = dv.astype(cdt)
        for kk in range(k):
            dkd_ref[kk, :] += jnp.sum(dv * n0_tap(kk, rows0), axis=0)
            # adjoint of v[t] += kd[kk] * n0[t + kk*d - pad_lo]:
            # dn0[t + kk*d - pad_lo] += kd[kk] * dv[t]
            shift = kk * dilation - pad_lo
            _accum_shifted(
                dn0_s, off2 + rows0, shift,
                kd_ref[kk, :].astype(cdt) * dvc, rc,
            )

        def gln0_sums(r0):
            vl = _valid(r0, 0, t_len, rc)
            dn0 = dn0_s[pl.ds(off2 + r0, rc), :].astype(jnp.float32)
            u = u_s[pl.ds(off + r0, rc), :].astype(jnp.float32)
            s0hat = jnp.where(vl, (u - mu0) * rs0, 0.0)
            dg0_ref[0, :] += jnp.sum(dn0 * s0hat, axis=0)
            dbe0_ref[0, :] += jnp.sum(dn0 * vl, axis=0)
            acc_s[2] += jnp.sum(g0w * dn0 * vl)
            acc_s[3] += jnp.sum(g0w * dn0 * s0hat)

        @pl.when(i > 0)
        def _():
            gln0_sums(rows0 - rc)

        @pl.when(i == n_chunks - 1)
        def _():
            gln0_sums(rows0)

    @pl.when(p_id == 2)
    def _phase2f():
        dn0 = dn0_s[pl.ds(off2 + rows0, rc), :].astype(jnp.float32)
        u = u_s[pl.ds(off + rows0, rc), :].astype(jnp.float32)
        s0hat = (u - mu0) * rs0
        du = rs0 * (
            g0w * dn0 - acc_s[2] / nhw - s0hat * (acc_s[3] / nhw)
        )
        du = jnp.where(valid_c, du, 0.0)
        s_mm = jnp.dot(
            x_ref[0], w1_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[0, 0, :]
        dscal_ref[0, 0] += jnp.sum(du * jnp.minimum(s_mm, 0.0))
        ds = du * jnp.where(s_mm >= 0, 1.0, p0)
        dsc = ds.astype(cdt)
        dx_ref[0] = (
            dy_ref[0].astype(jnp.float32)
            + jnp.dot(dsc, w1_ref[:].T, preferred_element_type=jnp.float32)
        ).astype(cdt)
        dw1_ref[:] += jnp.dot(
            x_ref[0].T, dsc, preferred_element_type=jnp.float32
        )
        db1e_ref[0, 0, :] += jnp.sum(ds, axis=0)


def _bwd_call(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
              stats, dy, dilation, k, causal, eps, valid_len=None):
    b, t_len, c = x.shape
    h = w1.shape[1]
    cdt = x.dtype
    rc = _RC_BWD
    if valid_len is not None:
        assert t_len % rc == 0 and valid_len <= t_len, (valid_len, t_len)
        tp, t_len = t_len, valid_len
    else:
        tp = _ceil_to(t_len, rc)
    pad_lo = dilation * (k - 1) if causal else dilation * (k - 1) // 2
    pad_hi = (k - 1) * dilation - pad_lo
    off = _ceil_to(pad_lo + 8, 16)
    pad_t = off + tp + _ceil_to(pad_hi + 16, 16)
    # scatter margins: shifts kk*d - pad_lo span [-pad_lo, pad_hi], so
    # the low margin needs pad_lo (+7 slack for _accum_shifted's
    # sublane-aligned windows) and the high margin pad_hi (+8): sizing
    # both to the causal worst case (k-1)*d cost an extra ~0.27 MB that
    # pushed the r5 4-sweep kernel over the 16 MB scoped-VMEM limit
    off2 = _ceil_to(pad_lo + 8, 16)
    pad_t2 = off2 + tp + _ceil_to(pad_hi + 16, 16)
    n_chunks = tp // rc
    if valid_len is None and tp != t_len:
        x = jnp.pad(x, ((0, 0), (0, tp - t_len), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, tp - t_len), (0, 0)))
    scal = jnp.stack([p0, p1]).reshape(1, 2).astype(jnp.float32)
    f32 = jnp.float32
    # executed: 7 matmul units (incl. in-kernel recompute of both 1x1
    # convs' activations); strict model bwd = dx+dW for each 1x1 (4
    # units) + the depthwise conv's dx/dW
    _record_flops(7 * b * t_len * c * h * 2,
                  model=4 * b * t_len * c * h * 2 + 2 * b * t_len * h * k * 2)

    grid = (b, 3, n_chunks)
    const = lambda bi, pi, ii: (0, 0)  # noqa: E731
    chunk = pl.BlockSpec((1, rc, c), lambda bi, pi, ii: (bi, ii, 0),
                         memory_space=pltpu.VMEM)
    # previous chunk of dy for the lagged gLN1-bwd work in P0
    chunk_prev = pl.BlockSpec(
        (1, rc, c),
        lambda bi, pi, ii: (bi, jnp.maximum(ii - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    vec_h = pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, t_len=t_len, n_chunks=n_chunks, k=k,
            dilation=dilation, pad_lo=pad_lo, off=off, off2=off2,
            eps=eps, cdt=cdt, rc=rc,
        ),
        grid=grid,
        in_specs=[
            chunk,                                              # x
            chunk,                                              # dy
            chunk_prev,                                         # dy prev
            pl.BlockSpec((1, 2), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.SMEM),              # scal
            pl.BlockSpec((1, 1, 4), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.SMEM),              # stats
            pl.BlockSpec((1, 1, h), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # b1_eff
            pl.BlockSpec((c, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h), const, memory_space=pltpu.VMEM),
            vec_h, vec_h, vec_h, vec_h, vec_h,                  # bd g0w g0b g1w g1b
            pl.BlockSpec((h, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            chunk,                                              # dx
            pl.BlockSpec((1, 1, h), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # db1e
            pl.BlockSpec((c, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h), const, memory_space=pltpu.VMEM),
            vec_h, vec_h, vec_h, vec_h, vec_h,  # dbd dg0 dbe0 dg1 dbe1
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.SMEM),              # dp0 dp1
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, c), cdt),
            jax.ShapeDtypeStruct((b, 1, h), f32),
            jax.ShapeDtypeStruct((c, h), f32),
            jax.ShapeDtypeStruct((h, c), f32),
            jax.ShapeDtypeStruct((k, h), f32),
            jax.ShapeDtypeStruct((1, h), f32),
            jax.ShapeDtypeStruct((1, h), f32),
            jax.ShapeDtypeStruct((1, h), f32),
            jax.ShapeDtypeStruct((1, h), f32),
            jax.ShapeDtypeStruct((1, h), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((pad_t, h), cdt),
            pltpu.VMEM((pad_t2, h), cdt),
            pltpu.SMEM((4,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # the 4-sweep kernel's phase-union stack peaks at 16.01 MB
            # at the dilation-128 block — just over the 16 MB default
            # scoped-vmem cap; grant it headroom explicitly
            vmem_limit_bytes=27 * 1024 * 1024,
        ),
        interpret=not pallas_available(),
    )(
        x, dy, dy, scal, stats, b1_eff.astype(f32)[:, None, :],
        w1.astype(cdt), kd.astype(cdt), bd.reshape(1, -1).astype(f32),
        g0w.reshape(1, -1).astype(f32), g0b.reshape(1, -1).astype(f32),
        g1w.reshape(1, -1).astype(f32), g1b.reshape(1, -1).astype(f32),
        w2.astype(cdt), b2.reshape(1, -1).astype(f32),
    )
    (dx, db1e, dw1, dw2, dkd, dbd, dg0, dbe0, dg1, dbe1, db2,
     dscal) = outs
    return (
        dx[:, :(tp if valid_len is not None else t_len)],
        db1e[:, 0, :],
        dw1, dw2, dkd, dbd.reshape(-1), dg0.reshape(-1),
        dbe0.reshape(-1), dg1.reshape(-1), dbe1.reshape(-1),
        db2.reshape(-1), dscal[0, 0], dscal[0, 1],
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def tcn_block_gln(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2,
                  g1w, g1b, dilation, k, causal, eps, valid_len=None):
    """Fused gLN TCN block: y = x + conv2(gLN1(PReLU(dconv(gLN0(
    PReLU(x @ w1 + b1_eff)))))). See the module docstring.

    x [B, T, C]; b1_eff [B, H] (per-batch bias, folds speaker-embed
    concat); w1 [C, H]; p0/p1 scalar PReLU slopes; kd [k, H] depthwise
    taps; bd [H]; g0w/g0b/g1w/g1b [H] gLN affines; w2 [H, C]; b2 [C].

    valid_len: PRE-PADDED mode for chained stacks (r5): x arrives
    already padded to a multiple of both chunk sizes and only rows
    [0, valid_len) are real. The kernel masks stats/taps to the valid
    range (as it always did) and returns the FULL padded length with
    rows >= valid_len carrying only the constant residual drift; the
    caller trims once after the last block. Saves the per-block
    pad + trim pair (32 of each at the SpEx+ envelope).
    """
    y, _ = _fwd_call(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2,
                     g1w, g1b, dilation, k, causal, eps, valid_len)
    return y


def _vjp_fwd(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
             dilation, k, causal, eps, valid_len=None):
    y, stats = _fwd_call(x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2,
                         b2, g1w, g1b, dilation, k, causal, eps,
                         valid_len)
    res = (x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
           stats)
    return y, res


def _vjp_bwd(dilation, k, causal, eps, valid_len, res, dy):
    (x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
     stats) = res
    (dx, db1e, dw1, dw2, dkd, dbd, dg0, dbe0, dg1, dbe1, db2, dp0,
     dp1) = _bwd_call(
        x, b1_eff, w1, p0, kd, bd, g0w, g0b, p1, w2, b2, g1w, g1b,
        stats, dy, dilation, k, causal, eps, valid_len,
    )
    return (dx, db1e, dw1.astype(w1.dtype), dp0.astype(p0.dtype),
            dkd.astype(kd.dtype), dbd.astype(bd.dtype),
            dg0.astype(g0w.dtype), dbe0.astype(g0b.dtype),
            dp1.astype(p1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype), dg1.astype(g1w.dtype),
            dbe1.astype(g1b.dtype))


tcn_block_gln.defvjp(_vjp_fwd, _vjp_bwd)
