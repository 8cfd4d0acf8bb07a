"""Fused Pallas Conv2dBlock for DPCCN: conv3x3 -> ELU -> InstanceNorm.

DPCCN's step is ~39% conv fusions + ~33% IN-stats reduce fusions
(BASELINE.md round-4 xplane attribution at 160 ms device/step): every
dense conv emits 16-64 channels against the 128-lane MXU and every conv
is followed by an instance norm whose global (T, F) statistics cost a
separate pass over the stream. Reference block:
/root/reference/wesep/modules/dpccn/convs.py:28-47
(Conv2d -> ELU -> InstanceNorm2d; NHWC here).

Kernel: y = IN(ELU(conv3x3(x) + b)), stride 1, pad 1, computed per
batch sample with the post-ELU stream VMEM-resident. Mosaic-critical
layout choice: everything is 2-D **F-major** — x enters as
[T, (F+pads) * Ci] (lane dim F*Ci >= 1000), the conv is lane-packed
block-Toeplitz ("patch") matmuls per F-block of P = 128/Cout outputs
(LHS [tc, (P+2)*Ci] contiguous column slices, RHS the banded weight
built at trace time in jnp — see ops/patch_conv.py for the skew
construction), and per-channel IN reductions are matmuls against a 0/1
channel-selector matrix. A channels-last [.., 16] layout is a Mosaic
trap: values tile to (8, 128) lanes, so 16-channel operands waste 8x
VMEM and 64x MXU (the first attempt OOM'd scoped vmem on a single
[64, 65, 16] reshape).

    grid (B, phase, nT) — e is RECOMPUTED per phase (the banded conv
    is cheap; a full-T e scratch exceeded the 16M scoped-vmem limit at
    the widest dec7 shapes):
      p0: e = ELU(patchconv(x_chunk)); channel sums via selector
      p1: y = (e - mu) * rs -> out
    bwd (custom VJP; per-channel mu/rs saved from fwd):
      p0: IN-bwd channel sums (S_a = sum dy, S_b = sum dy*e_hat)
      p1: dout on margin-1 rows (ELU' recovered from e: e' = 1 if e>0
          else e+1); db; banded dWb += xb^T dout; dx via wb^T

The T-halo comes from NEIGHBOR grid blocks (x and dy are each passed
three times with block index maps i-1 / i / i+1, clamped + masked); the
F-halo is true zero padding added outside the kernel. The banded-weight
and padding constructions live OUTSIDE the custom_vjp, so their
gradients (banded dWb -> dK, padded dx2 -> dx) fall out of autodiff.

Stride-1 3x3 pad-1 convs only; models/dpccn.py routes Conv2dBlock here
behind conv_impl="pallas" (WESEP_CONV2D_PALLAS gates). Exact-parity
tests: tests/test_pallas_conv2d.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wesep_tpu.ops.pallas_lstm import _record_flops, pallas_available

__all__ = ["conv2d_block_in", "pallas_available"]


def _ceil_to(x, m):
    return -(-x // m) * m


def _pick_p(co):
    return max(2, min(8, 128 // co))


def _pick_tc(f, ci, co, p):
    """T-chunk rows: per-row cost ~ the padded x row + e row + taps.

    The budget (and the matching vmem_limit_bytes on the pallas_calls)
    was raised in r5 once the 16 MB scoped-VMEM cap turned out to be a
    compiler default, not the physical limit (see ops/pallas_tcn.py) —
    the original falsification blamed VMEM-forced tiny chunks for
    starving the MXU, so this directly retests that premise
    (WESEP_CONV2D_BUDGET_MB to sweep)."""
    import os

    budget = int(os.environ.get("WESEP_CONV2D_BUDGET_MB", "16")) << 20
    per_row = (f + p + 2) * ci * 4 * 3 + f * co * 4 * 2
    tc = max(16, min(1024, (budget // per_row) // 16 * 16))
    return tc


def _banded(kdt, p, ci, co):
    """[3, Ci, Co] -> block-Toeplitz [(P+2)*Ci, P*Co] with
    W[(r, ci), (q, co)] = kdt[r - q, ci, co] for r-q in {0,1,2}
    (skew trick: pure pad/reshape, cheap adjoint — cf. patch_conv)."""
    rows = jnp.broadcast_to(kdt[None], (p, 3, ci, co))
    rows = jnp.pad(rows, ((0, 0), (0, p), (0, 0), (0, 0)))
    flat = rows.reshape(p * (p + 3), ci, co)[: p * (p + 2)]
    wt = flat.reshape(p, p + 2, ci, co)
    return jnp.transpose(wt, (1, 2, 0, 3)).reshape((p + 2) * ci, p * co)


def _selector(f, co, dtype):
    """[F*Co, Co] 0/1 matrix: column c sums the F-major positions of
    channel c (per-channel spatial reduction as ONE matmul)."""
    fc = jax.lax.broadcasted_iota(jnp.int32, (f * co, co), 0) % co
    c = jax.lax.broadcasted_iota(jnp.int32, (f * co, co), 1)
    return (fc == c).astype(dtype)


def _elu(x):
    # exp(x) - 1 rather than expm1 (no Mosaic lowering); only the
    # x <= 0 branch uses it, abs err ~1e-8 f32
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _conv_rows(xm, xc, xn, wb_ref, row0, t_len, tc, nf, p, ci, co,
               m=0):
    """Patch conv for rows [row0-m, row0+tc+m): returns
    [tc+2m, Fp*Co] f32 (pre-bias; callers slice cols to F*Co and add
    the broadcast bias). xm/xc/xn: the three neighbor T-blocks
    [tc, (F+pads)*Ci]; requires m + 1 <= tc."""
    xa = jnp.concatenate(
        [xm[-(m + 1):], xc, xn[: m + 1]], axis=0
    )
    nrows = tc + 2 * m + 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) + (
        row0 - m - 1
    )
    xa = jnp.where((rows >= 0) & (rows < t_len), xa, jnp.zeros((), xa.dtype))
    out = None
    for dt in range(3):
        xt = xa[dt : dt + tc + 2 * m]
        cols = []
        for j in range(nf):
            lhs = xt[:, j * p * ci : (j * p + p + 2) * ci]
            cols.append(
                jnp.dot(lhs, wb_ref[dt], preferred_element_type=jnp.float32)
            )
        o = jnp.concatenate(cols, axis=1)
        out = o if out is None else out + o
    return out


def _fwd_kernel(
    xm_ref, xc_ref, xn_ref, wb_ref, bb_ref, sel_ref,
    y_ref, stats_ref,
    acc_s,
    *, t_len, n_chunks, tc, f, nf, p, ci, co, eps, cdt,
):
    p_id = pl.program_id(1)
    i = pl.program_id(2)
    row0 = i * tc
    nsp = jnp.float32(t_len * f)

    def e_chunk():
        out = _conv_rows(
            xm_ref[0], xc_ref[0], xn_ref[0], wb_ref,
            row0, t_len, tc, nf, p, ci, co,
        )[:, : f * co] + bb_ref[0, :]
        e = _elu(out)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0) + row0
        return jnp.where(rows < t_len, e, 0.0)

    @pl.when(p_id == 0)
    def _phase0():
        @pl.when(i == 0)
        def _():
            acc_s[0, :] = jnp.zeros((co,), jnp.float32)
            acc_s[1, :] = jnp.zeros((co,), jnp.float32)

        e = e_chunk()
        acc_s[0, :] += jnp.sum(
            jnp.dot(e.astype(cdt), sel_ref[:],
                    preferred_element_type=jnp.float32),
            axis=0,
        )
        acc_s[1, :] += jnp.sum(
            jnp.dot((e * e).astype(cdt), sel_ref[:],
                    preferred_element_type=jnp.float32),
            axis=0,
        )

        @pl.when(i == n_chunks - 1)
        def _():
            mu = acc_s[0, :] / nsp
            var = jnp.maximum(acc_s[1, :] / nsp - mu * mu, 0.0)
            stats_ref[0, 0, :] = mu
            stats_ref[0, 1, :] = jax.lax.rsqrt(var + eps)

    @pl.when(p_id == 1)
    def _phase1():
        # recompute e (the banded conv is cheap; a full-T e scratch blew
        # the 16M scoped-vmem limit at the widest dec7 shapes). The
        # per-channel stats broadcast to F-major [1, F*Co] rides the
        # selector matmul (a [F,Co] -> [1, F*Co] reshape is an
        # unsupported Mosaic shape cast).
        mu_bc = jnp.dot(
            stats_ref[0, 0:1, :], sel_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        rs_bc = jnp.dot(
            stats_ref[0, 1:2, :], sel_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        e = e_chunk()
        y_ref[0] = ((e - mu_bc) * rs_bc).astype(cdt)


def _fwd_call(x2, wb, bias, shapes, eps):
    """x2: [B, Tp, (1 + Fp + pad_hi) * Ci] F-major padded input."""
    b, t_len, f, fp, ci, co, p = shapes
    cdt = x2.dtype
    nf = fp // p
    tc = _pick_tc(f, ci, co, p)
    tp = _ceil_to(t_len, tc)
    n_chunks = tp // tc
    if tp != x2.shape[1]:
        x2 = jnp.pad(x2, ((0, 0), (0, tp - x2.shape[1]), (0, 0)))
    f32 = jnp.float32
    _record_flops(b * t_len * nf * p * 3 * (p + 2) * ci * co * 2)
    wide = x2.shape[2]

    def blk(off, w):
        def index(bi, pi, ii):
            return (bi, jnp.clip(ii + off, 0, n_chunks - 1), 0)

        return pl.BlockSpec((1, tc, w), index, memory_space=pltpu.VMEM)

    y2, stats = pl.pallas_call(
        functools.partial(
            _fwd_kernel, t_len=t_len, n_chunks=n_chunks, tc=tc, f=f,
            nf=nf, p=p, ci=ci, co=co, eps=eps, cdt=cdt,
        ),
        grid=(b, 2, n_chunks),
        in_specs=[
            blk(-1, wide), blk(0, wide), blk(1, wide),
            pl.BlockSpec((3, (p + 2) * ci, p * co),
                         lambda bi, pi, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f * co), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f * co, co), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tc, f * co), lambda bi, pi, ii: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, co), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, f * co), cdt),
            jax.ShapeDtypeStruct((b, 2, co), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, co), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "WESEP_CONV2D_VMEM_MB", "26")) * 1024 * 1024,
        ),
        interpret=not pallas_available(),
    )(
        x2, x2, x2, wb.astype(cdt),
        jnp.broadcast_to(
            bias.astype(f32)[None, :], (f, co)
        ).reshape(1, f * co),
        _selector(f, co, cdt),
    )
    return y2[:, :t_len], stats


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    xm_ref, xc_ref, xn_ref, dym_ref, dyc_ref, dyn_ref, wb_ref, bb_ref,
    sel_ref, stats_ref,
    dx_ref, dwb_ref, db_ref,
    acc_s,
    *, t_len, n_chunks, tc, f, nf, p, ci, co, cdt,
):
    b_id = pl.program_id(0)
    p_id = pl.program_id(1)
    i = pl.program_id(2)
    row0 = i * tc
    nsp = jnp.float32(t_len * f)

    def bc(row):
        return jnp.dot(
            stats_ref[0, row : row + 1, :], sel_ref[:].T,
            preferred_element_type=jnp.float32,
        )

    def e_rows(m):
        out = _conv_rows(
            xm_ref[0], xc_ref[0], xn_ref[0], wb_ref,
            row0, t_len, tc, nf, p, ci, co, m=m,
        )[:, : f * co] + bb_ref[0, :]
        e = _elu(out)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tc + 2 * m, 1), 0
        ) + (row0 - m)
        return jnp.where((rows >= 0) & (rows < t_len), e, 0.0)

    @pl.when(p_id == 0)
    def _phase0():
        @pl.when((b_id == 0) & (i == 0))
        def _():
            dwb_ref[:] = jnp.zeros_like(dwb_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        @pl.when(i == 0)
        def _():
            acc_s[0, :] = jnp.zeros((co,), jnp.float32)
            acc_s[1, :] = jnp.zeros((co,), jnp.float32)

        dy = dyc_ref[0].astype(jnp.float32)
        ehat = (e_rows(0) - bc(0)) * bc(1)
        acc_s[0, :] += jnp.sum(
            jnp.dot(dy.astype(cdt), sel_ref[:],
                    preferred_element_type=jnp.float32),
            axis=0,
        )
        acc_s[1, :] += jnp.sum(
            jnp.dot((dy * ehat).astype(cdt), sel_ref[:],
                    preferred_element_type=jnp.float32),
            axis=0,
        )

    @pl.when(p_id == 1)
    def _phase1():
        mu_bc = bc(0)
        rs_bc = bc(1)
        sa_bc = jnp.dot(
            acc_s[0:1, :], sel_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        sb_bc = jnp.dot(
            acc_s[1:2, :], sel_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        # dout on rows [row0-1, row0+tc+1): dy halo from neighbor
        # blocks, e recomputed with margin 1
        dy_ext = jnp.concatenate(
            [dym_ref[0][-1:], dyc_ref[0], dyn_ref[0][:1]], axis=0
        ).astype(jnp.float32)
        e_ext = e_rows(1)
        ehat = (e_ext - mu_bc) * rs_bc
        de = rs_bc * (dy_ext - sa_bc / nsp - ehat * (sb_bc / nsp))
        dout = de * jnp.where(e_ext > 0, 1.0, e_ext + 1.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tc + 2, 1), 0) + (
            row0 - 1
        )
        dout = jnp.where((rows >= 0) & (rows < t_len), dout, 0.0)
        dc = dout[1 : 1 + tc]
        db_ref[0, :] += jnp.sum(
            jnp.dot(dc.astype(cdt), sel_ref[:],
                    preferred_element_type=jnp.float32),
            axis=0,
        )

        # x assembly (masked rows, padded layout) for dWb
        xa = jnp.concatenate(
            [xm_ref[0][-1:], xc_ref[0], xn_ref[0][:1]], axis=0
        )
        xa = jnp.where(
            (rows >= 0) & (rows < t_len), xa, jnp.zeros((), xa.dtype)
        )
        # pad dout cols to the Fp*Co grid so edge F-blocks slice cleanly
        dpad = jnp.pad(dout, ((0, 0), (0, nf * p * co - f * co)))
        dc_pad = dpad[1 : 1 + tc]
        for dt in range(3):
            xt = xa[dt : dt + tc]
            for j in range(nf):
                xb = xt[:, j * p * ci : (j * p + p + 2) * ci]
                dwb_ref[dt] += jnp.dot(
                    xb.T, dc_pad[:, j * p * co : (j + 1) * p * co].astype(
                        cdt
                    ),
                    preferred_element_type=jnp.float32,
                )

        # dx2: dx[t] += sum_dt dout[t - dt + 1] @ wb[dt]^T over the
        # overlapping F-block windows. Adjacent blocks overlap by 2*Ci
        # cols, so assemble each dt's contribution as two aligned
        # concats (cores at j*P*Ci, zero-padded tails shifted by P*Ci)
        # — in-kernel scatter-add has no Mosaic lowering.
        wide = xm_ref.shape[2]
        dxbuf = jnp.zeros((tc, wide), jnp.float32)
        for dt in range(3):
            dslice = dpad[2 - dt : 2 - dt + tc]
            cores = []
            tails = []
            for j in range(nf):
                term = jnp.dot(
                    dslice[:, j * p * co : (j + 1) * p * co].astype(cdt),
                    wb_ref[dt].T,
                    preferred_element_type=jnp.float32,
                )
                cores.append(term[:, : p * ci])
                tails.append(
                    jnp.pad(
                        term[:, p * ci :],
                        ((0, 0), (0, (p - 2) * ci)),
                    )
                )
            core = jnp.concatenate(cores, axis=1)
            tail = jnp.concatenate(tails, axis=1)
            w0 = nf * p * ci
            dxbuf = dxbuf + jnp.pad(core, ((0, 0), (0, wide - w0)))
            # the shifted tail run extends past `wide` by (P-2)*Ci zero
            # cols of the last block's padding region — clip; everything
            # clipped lies in x2's F padding, dropped by the outer unpad
            tail = tail[:, : wide - p * ci]
            dxbuf = dxbuf + jnp.pad(tail, ((0, 0), (p * ci, 0)))
        dx_ref[0] = dxbuf.astype(cdt)


def _bwd_call(x2, wb, bias, stats, dy2, shapes, eps):
    b, t_len, f, fp, ci, co, p = shapes
    cdt = x2.dtype
    nf = fp // p
    tc = _pick_tc(f, ci, co, p)
    tp = _ceil_to(t_len, tc)
    n_chunks = tp // tc
    if tp != x2.shape[1]:
        x2 = jnp.pad(x2, ((0, 0), (0, tp - x2.shape[1]), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, 0), (0, tp - dy2.shape[1]), (0, 0)))
    f32 = jnp.float32
    # executed = 3x fwd (conv recompute + dx + dW); strict model bwd = 2x
    _record_flops(3 * b * t_len * nf * p * 3 * (p + 2) * ci * co * 2,
                  model=2 * b * t_len * nf * p * 3 * (p + 2) * ci * co * 2)
    wide = x2.shape[2]

    def blk(off, w):
        def index(bi, pi, ii):
            return (bi, jnp.clip(ii + off, 0, n_chunks - 1), 0)

        return pl.BlockSpec((1, tc, w), index, memory_space=pltpu.VMEM)

    dx2, dwb, db = pl.pallas_call(
        functools.partial(
            _bwd_kernel, t_len=t_len, n_chunks=n_chunks, tc=tc, f=f,
            nf=nf, p=p, ci=ci, co=co, cdt=cdt,
        ),
        grid=(b, 2, n_chunks),
        in_specs=[
            blk(-1, wide), blk(0, wide), blk(1, wide),
            blk(-1, f * co), blk(0, f * co), blk(1, f * co),
            pl.BlockSpec((3, (p + 2) * ci, p * co),
                         lambda bi, pi, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f * co), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f * co, co), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, co), lambda bi, pi, ii: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tc, wide), lambda bi, pi, ii: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, (p + 2) * ci, p * co),
                         lambda bi, pi, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, pi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, wide), cdt),
            jax.ShapeDtypeStruct((3, (p + 2) * ci, p * co), f32),
            jax.ShapeDtypeStruct((1, co), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, co), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "WESEP_CONV2D_VMEM_MB", "26")) * 1024 * 1024,
        ),
        interpret=not pallas_available(),
    )(
        x2, x2, x2, dy2, dy2, dy2, wb.astype(cdt),
        jnp.broadcast_to(
            bias.astype(f32)[None, :], (f, co)
        ).reshape(1, f * co),
        _selector(f, co, cdt), stats,
    )
    return dx2[:, :t_len], dwb, db.reshape(-1)


def _prep(x, kernel, bias):
    """Trace-time layout prep OUTSIDE the custom_vjp: gradients of the
    banded weight and the padded F-major input map back to the dense
    kernel / NHWC x via plain autodiff."""
    b, t_len, f, ci = x.shape
    co = kernel.shape[-1]
    p = _pick_p(co)
    fp = _ceil_to(f, p)
    # F-pad: 1 zero in front (the conv's left pad), enough at the back
    # that every F-block's (P+2)-wide window is in range
    x2 = jnp.pad(x, ((0, 0), (0, 0), (1, fp + 1 - f), (0, 0)))
    x2 = x2.reshape(b, t_len, (fp + 2) * ci)
    wb = jnp.stack([_banded(kernel[dt], p, ci, co) for dt in range(3)])
    shapes = (b, t_len, f, fp, ci, co, p)
    return x2, wb, shapes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _inner(x2, wb, bias, shapes, eps):
    y2, _ = _fwd_call(x2, wb, bias, shapes, eps)
    return y2


def _inner_fwd(x2, wb, bias, shapes, eps):
    y2, stats = _fwd_call(x2, wb, bias, shapes, eps)
    return y2, (x2, wb, bias, stats)


def _inner_bwd(shapes, eps, res, dy2):
    x2, wb, bias, stats = res
    dx2, dwb, db = _bwd_call(x2, wb, bias, stats, dy2, shapes, eps)
    return dx2, dwb.astype(wb.dtype), db.astype(bias.dtype)


def conv2d_block_in(x, kernel, bias, eps=1e-5):
    """y = InstanceNorm(ELU(conv3x3(x) + bias)), stride 1, pad 1, NHWC.

    x [B, T, F, Cin]; kernel [3, 3, Cin, Cout] (HWIO, H=T, W=F);
    bias [Cout]. Returns [B, T, F, Cout]."""
    b, t_len, f, ci = x.shape
    co = kernel.shape[-1]
    x2, wb, shapes = _prep(x, kernel, bias)
    y2 = _inner(x2, wb, bias, shapes, eps)
    return y2.reshape(b, t_len, f, co)


_inner.defvjp(_inner_fwd, _inner_bwd)
