"""DPCCN block-Toeplitz "patch matmul" experiment (VERDICT r3 #3 / r4).

DPCCN's dense 3x3 convs emit 16-32 output channels against the 128-lane
MXU (<=25% lane occupancy; BASELINE.md round-3 study). This experiment
packs P adjacent FREQ outputs into the lane dim: the conv becomes, per
time-tap dt, a matmul of im2row'd freq blocks [.., (P+2)*Cin] against a
block-Toeplitz weight [(P+2)*Cin, P*Cout] built at trace time from the
3x3 kernel. Lane occupancy rises Cout/128 -> P*Cout/128 at a
(P+2)/3 x FLOP inflation (the band is 3 of P+2 rows): at P=8, Cout=16
that is 8x lanes for 3.33x FLOPs, a ~2.4x theoretical conv win.

Run on the chip:  python tools/exp_patch_matmul.py [--whole-model]

Measures a full-resolution DenseBlock (F=257, the round-3-identified
cost center: ~45 ms fwd+bwd each) in both forms, then optionally the
whole-model step with Conv2dBlock routed through the patch matmul.
Results land in BASELINE.md either way (win or falsification).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def conv3x3_patch(x, kernel, bias, P=8):
    """3x3 'same' conv on [B, T, F, C] via freq-packed block-Toeplitz
    matmuls. kernel: flax HWIO [3, 3, Cin, Cout] (H=time, W=freq)."""
    B, T, F, Ci = x.shape
    Co = kernel.shape[-1]
    nF = -(-F // P)
    Fp = nF * P
    # pad: 1 halo row at the freq front; P extra at the back so the
    # shifted reshape below stays in-bounds; 1 halo frame each time end
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Fp + P - 1 - F), (0, 0)))
    # freq blocks with 2-row halo: rows [j*P, j*P + P + 2)
    a = xp[:, :, :Fp].reshape(B, T + 2, nF, P, Ci)
    tail = xp[:, :, P : Fp + P].reshape(B, T + 2, nF, P, Ci)[:, :, :, :2]
    xb = jnp.concatenate([a, tail], axis=3)  # [B, T+2, nF, P+2, Ci]

    # block-Toeplitz weights: W_dt[r, ci, p, co] = K[dt, r-p, ci, co]
    # for r-p in {0,1,2} (freq tap df = r-p; output row p reads padded
    # input rows p..p+2 = original rows p-1..p+1). Built by the skew
    # trick (pad rows to P+3 and re-stride) — pure pad/reshape, so the
    # adjoint is a cheap slice instead of P scatter-adjoints.
    def banded(kdt):  # [3, Ci, Co] -> [(P+2)*Ci, P*Co]
        rows = jnp.broadcast_to(kdt[None], (P, 3, Ci, Co))
        rows = jnp.pad(rows, ((0, 0), (0, P), (0, 0), (0, 0)))
        flat = rows.reshape(P * (P + 3), Ci, Co)[: P * (P + 2)]
        wt = flat.reshape(P, P + 2, Ci, Co)  # wt[p, r] = K[r - p]
        return jnp.transpose(wt, (1, 2, 0, 3)).reshape(
            (P + 2) * Ci, P * Co
        )

    flat = xb.reshape(B, T + 2, nF, (P + 2) * Ci)
    y = None
    for dt in range(3):
        term = flat[:, dt : T + dt] @ banded(kernel[dt])
        y = term if y is None else y + term
    y = y.reshape(B, T, nF * P, Co)[:, :, :F]
    return y + bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_patch_hybrid(x, kernel, bias, P=8):
    """fwd = patch matmul (lane-packed); bwd = XLA's native conv grads
    (the patch form's backward regresses: dW pays the (P+2)/3 FLOP
    inflation at full density and the im2row adjoint materializes)."""
    return conv3x3_patch(x, kernel, bias, P)


def _hyb_fwd(x, kernel, bias, P):
    return conv3x3_patch(x, kernel, bias, P), (x, kernel)


def _hyb_bwd(P, res, dy):
    # XLA's native conv grad lowerings (transposed conv for dx,
    # conv_backprop_filter for dw) — the patch form's own backward
    # regresses and a hand-written dW-as-conv with a [T,F]-sized
    # "kernel" is catastrophically slow on TPU (measured 0.74x)
    x, kernel = res
    zeros_b = jnp.zeros(kernel.shape[-1], kernel.dtype)
    _, vjp = jax.vjp(conv3x3_ref, x, kernel, zeros_b)
    return vjp(dy)


conv3x3_patch_hybrid.defvjp(_hyb_fwd, _hyb_bwd)


def conv3x3_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def instance_norm(x, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x), axis=axes, keepdims=True,
                  dtype=jnp.float32)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    return (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
        var + eps
    ).astype(x.dtype)


def dense_block(params, x, conv_fn):
    """5-layer dense concat block, DPCCN enc0 shape (in 16 -> out 16)."""
    outs = [x]
    for i in range(5):
        k, b = params[i]
        y = conv_fn(jnp.concatenate(outs, axis=-1), k, b)
        y = instance_norm(jax.nn.elu(y))
        outs.append(y)
    return outs[-1]


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--P", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--T", type=int, default=376)
    ap.add_argument("--F", type=int, default=257)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    B, T, F = args.B, args.T, args.F

    x = jnp.asarray(rng.standard_normal((B, T, F, 16)), dt)
    params = []
    for i in range(5):
        cin = 16 * (i + 1)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, 16)) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal((16,)) * 0.01, dt)
        params.append((k, b))

    # parity first
    f_ref = jax.jit(lambda p, x: dense_block(p, x, conv3x3_ref))
    f_pat = jax.jit(functools.partial(
        lambda p, x, P: dense_block(
            p, x, functools.partial(conv3x3_patch, P=P)
        ), P=args.P,
    ))
    yr = np.asarray(f_ref(params, x), np.float32)
    yp = np.asarray(f_pat(params, x), np.float32)
    err = np.abs(yr - yp).max()
    print(f"parity max|d| = {err:.2e}")
    # IN's rsqrt amplifies accumulation-order noise across the 5 layers;
    # the raw conv is exact to ~2e-6 f32 (see the inline parity check in
    # tests if promoted)
    assert err < (2e-1 if dt == jnp.bfloat16 else 5e-3)

    ms_ref = bench(f_ref, params, x)
    ms_pat = bench(f_pat, params, x)
    print(f"fwd   DenseBlock: ref {ms_ref:.2f} ms  patch {ms_pat:.2f} ms "
          f"({ms_ref / ms_pat:.2f}x)")

    def loss_ref(p, x):
        return jnp.sum(dense_block(p, x, conv3x3_ref).astype(jnp.float32))

    def loss_pat(p, x):
        return jnp.sum(
            dense_block(
                p, x, functools.partial(conv3x3_patch, P=args.P)
            ).astype(jnp.float32)
        )

    g_ref = jax.jit(jax.grad(loss_ref))
    g_pat = jax.jit(jax.grad(loss_pat))
    ms_gref = bench(g_ref, params, x)
    ms_gpat = bench(g_pat, params, x)
    print(f"fwd+bwd DenseBlock: ref {ms_gref:.2f} ms  patch "
          f"{ms_gpat:.2f} ms ({ms_gref / ms_gpat:.2f}x)")

    def loss_hyb(p, x):
        return jnp.sum(
            dense_block(
                p, x, functools.partial(conv3x3_patch_hybrid, P=args.P)
            ).astype(jnp.float32)
        )

    g_hyb = jax.jit(jax.grad(loss_hyb))
    # grad parity vs ref
    gr = g_ref(params, x)
    gh = g_hyb(params, x)
    gerr = max(
        float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gh))
    )
    print(f"hybrid grad parity max|d| = {gerr:.2e}")
    ms_ghyb = bench(g_hyb, params, x)
    print(f"fwd+bwd DenseBlock: hybrid {ms_ghyb:.2f} ms "
          f"({ms_gref / ms_ghyb:.2f}x)")


if __name__ == "__main__":
    main()
