"""Fused LSTM for TPU: one big input projection matmul + lax.scan recurrence.

The reference models leans heavily on nn.LSTM over large folded batches
(BSRNN band/time RNNs, /root/reference/wesep/models/bsrnn.py:16-83;
TF-GridNet intra/inter LSTMs, /root/reference/wesep/modules/tfgridnet/
gridnet_block.py:139-186). A sequential RNN is the main TPU speed-of-light
risk, so the design here:

  * the input projection x @ W_x for ALL timesteps is hoisted out of the
    recurrence into a single [B*T, 4H] matmul (MXU, large tile);
  * the scan carries only h @ W_h ([B, 4H] per step) — the irreducible
    sequential part — with all four gates fused in one matmul;
  * bidirectional = forward scan + reversed scan, concatenated;
  * optionally runs the recurrence in bfloat16 with float32 cell state.

These are plain functions over explicit weights so that flax modules and
Pallas/pjit wrappers can share them.
"""

import os

import jax
import jax.numpy as jnp

__all__ = ["lstm", "bilstm"]


def _use_pallas(batch: int, hidden: int) -> bool:
    """Dispatch the recurrence to the Pallas kernel when on TPU and the
    shapes satisfy its tiling (H multiple of 128 on the lane dim, batch a
    multiple of 8). ~8-10x faster than lax.scan at BSRNN shapes; exact
    same math (see ops/pallas_lstm.py). WESEP_NO_PALLAS=1 disables."""
    if os.environ.get("WESEP_NO_PALLAS"):
        return False
    # lane dim of the gates matmul (4H) must tile to 128; Mosaic pads the
    # H-sized state blocks (verified numerically at H=192). Non-multiple-
    # of-8 batches are zero-padded by the caller.
    if (4 * hidden) % 128 != 0:
        return False
    from wesep_tpu.ops.pallas_lstm import pallas_available

    return pallas_available()


def _lstm_scan(xw, wh, h0, c0, reverse=False):
    """Scan the LSTM recurrence.

    xw:  [T, B, 4H]  precomputed x @ W_x + b
    wh:  [H, 4H]
    h0/c0: [B, H]
    Returns outputs [T, B, H].
    Gate order follows torch convention (i, f, g, o).
    """
    hidden = wh.shape[0]

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + jnp.matmul(h, wh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[..., :hidden])
        f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden :])
        c = f * c + i * g
        h = (o * jnp.tanh(c)).astype(xw_t.dtype)
        return (h, c), h

    (_, _), ys = jax.lax.scan(step, (h0, c0), xw, reverse=reverse)
    return ys


def lstm(x, wx, wh, b, reverse=False):
    """Unidirectional LSTM.

    x: [B, T, D]; wx: [D, 4H]; wh: [H, 4H]; b: [4H] -> [B, T, H].
    """
    hidden = wh.shape[0]
    batch = x.shape[0]
    if _use_pallas(batch, hidden):
        from wesep_tpu.ops.pallas_lstm import lstm_fused

        pad = (-batch) % 8  # sublane-align the folded batch dim
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ys = lstm_fused(x, wx, b, wh, reverse)
        if pad:
            ys = ys[:batch]
        return ys
    xw = jnp.einsum("btd,dh->bth", x, wx, preferred_element_type=jnp.float32)
    xw = (xw + b).astype(x.dtype)
    xw = jnp.swapaxes(xw, 0, 1)  # time-major for scan
    h0 = jnp.zeros((batch, hidden), x.dtype)
    c0 = jnp.zeros((batch, hidden), jnp.float32)
    ys = _lstm_scan(xw, wh, h0, c0, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm(x, wx_f, wh_f, b_f, wx_b, wh_b, b_b):
    """Bidirectional LSTM: concat(forward, backward) -> [B, T, 2H].

    On TPU both directions run fused in ONE Pallas kernel — the two
    recurrences are data-independent, so each grid step has two
    concurrent MXU dots that hide each other's VPU gate latency
    (ops/pallas_lstm.bilstm_fused)."""
    hidden = wh_f.shape[0]
    batch = x.shape[0]
    if _use_pallas(batch, hidden):
        from wesep_tpu.ops.pallas_lstm import bilstm_fused, bilstm_layer

        pad = (-batch) % 8
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        if os.environ.get("WESEP_LSTM_LAYER", "1") != "0":
            # fully-fused layer kernel: gate projections + weight grads
            # stay in VMEM; nothing 4H-wide touches HBM
            ys = bilstm_layer(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
        else:
            ys = bilstm_fused(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b)
        if pad:
            ys = ys[:batch]
        return ys
    fwd = lstm(x, wx_f, wh_f, b_f, reverse=False)
    bwd = lstm(x, wx_b, wh_b, b_b, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def unfold_frames(x, ks: int, hs: int):
    """[B, L, C] -> [B, T', C*ks] sliding frames in torch F.unfold
    CHANNEL-major order (c*ks + k), T' = (L-ks)//hs + 1 (the GridNet
    fold boundary, reference gridnet_block.py:139-186)."""
    import numpy as np

    bsz, length, c = x.shape
    n = (length - ks) // hs + 1
    idx = np.arange(n)[:, None] * hs + np.arange(ks)[None, :]
    frames = x[:, idx]  # [B, T', ks, C]
    frames = jnp.swapaxes(frames, -1, -2)  # [B, T', C, ks]
    return frames.reshape(bsz, n, c * ks)


def bilstm_unfold(x, wx_f, wh_f, b_f, wx_b, wh_b, b_b, ks, hs):
    """unfold(ks, hs) + bidirectional LSTM, fused on TPU.

    x: [B, L, C]; weights in the unfolded layout ([ks*C, 4H], channel-
    major rows) — identical params to bilstm(unfold_frames(x)).

    WESEP_LSTM_UNFOLD=1 routes to the fully-fused kernel
    (ops/pallas_lstm.bilstm_layer_unfold: the unfolded [T', B, ks*C]
    stream never exists — ks shifted views of x per direction, in-kernel
    concat + flat projection). Measured SLOWER in-model at TF-GridNet
    recipe shapes and therefore NOT the default (v5e, batch 2 x 3 s:
    materialized-unfold 92.9 ms/step, fused concat-variant 97.5,
    fused per-tap-dots 109.4 — the per-step in-kernel work multiplies
    by T and outweighs the one-time XLA-side unfold/transpose streams;
    BASELINE.md round-5 falsification note). Kept for study and for
    its 4x smaller saved residuals."""
    hidden = wh_f.shape[0]
    batch = x.shape[0]
    if (_use_pallas(batch, hidden)
            and os.environ.get("WESEP_LSTM_UNFOLD") == "1"):
        from wesep_tpu.ops.pallas_lstm import bilstm_layer_unfold

        pad = (-batch) % 8
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ys = bilstm_layer_unfold(x, wx_f, b_f, wh_f, wx_b, b_b, wh_b,
                                 ks, hs)
        if pad:
            ys = ys[:batch]
        return ys
    return bilstm(unfold_frames(x, ks, hs), wx_f, wh_f, b_f,
                  wx_b, wh_b, b_b)
