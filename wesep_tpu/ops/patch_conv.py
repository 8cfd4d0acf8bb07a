"""Lane-packed "patch matmul" 3x3 conv for narrow-channel NHWC convs.

DPCCN's dense U-Net emits 16-64 output channels per conv against the
128-lane MXU, an architecture-imposed <=25% lane-occupancy ceiling for
XLA's native conv (BASELINE.md round-3/4 DPCCN studies; reference shape:
/root/reference/wesep/modules/dpccn/convs.py:73-103). This op packs P
adjacent FREQ outputs into the lane dim: per time-tap dt, the conv
becomes a matmul of im2row'd freq blocks [.., (P+2)*Cin] against a
block-Toeplitz weight [(P+2)*Cin, P*Cout] built at trace time by the
skew trick (pure pad/reshape, cheap adjoint). Lane occupancy rises
Cout/128 -> P*Cout/128 at a (P+2)/3x FLOP inflation (the band fills 3
of P+2 rows):

    P = 128//Cout :  8 (Cout 16) -> 8x lanes / 3.33x FLOPs
                     4 (Cout 32) -> 4x lanes / 2.00x FLOPs

Measured on one v5e chip (tools/exp_patch_matmul.py + whole-model run,
BASELINE.md round-4 DPCCN study):

  * isolated full-res DenseBlock ([8, 376, 257, 16..80] bf16):
    forward 1.68x, fwd+bwd 1.13x (the backward's dW pays the FLOP
    inflation at full density; routing the backward through XLA's
    native conv grads instead was falsified at 0.74x).
  * IN-MODEL: **falsified both ways** — train step 163.5 -> 361.9
    ms/step (0.45x), whole-model inference fwd 67 -> 125 ms (0.54x).
    Behind the dense concats the im2row materializations defeat XLA's
    conv(concat) fusion, exactly like the round-3 9-shifted-einsum
    attempt; the isolated-block win does not survive integration. Any
    remaining lane-packing win needs the im2row held in VMEM by a
    Pallas kernel, not an XLA-level rewrite.

Exact vs lax conv to ~2e-6 f32 (tests/test_patch_conv.py). Kept as a
measured-study artifact and selectable via DPCCN(conv_impl="patch");
the default stays "xla".
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from wesep_tpu.ops.init import torch_linear_init

__all__ = ["conv3x3_patch", "PatchConv3x3"]


def _banded(kdt, P, Ci, Co):
    """[3, Ci, Co] -> block-Toeplitz [(P+2)*Ci, P*Co] with
    W[r, ci, p, co] = kdt[r - p, ci, co] for r-p in {0, 1, 2}, built by
    the skew trick (pad each of the P rows to length P+3 and re-stride:
    row-major position p*(P+3)+j lands at banded column p+j)."""
    rows = jnp.broadcast_to(kdt[None], (P, 3, Ci, Co))
    rows = jnp.pad(rows, ((0, 0), (0, P), (0, 0), (0, 0)))
    flat = rows.reshape(P * (P + 3), Ci, Co)[: P * (P + 2)]
    wt = flat.reshape(P, P + 2, Ci, Co)  # wt[p, r] = kdt[r - p]
    return jnp.transpose(wt, (1, 2, 0, 3)).reshape((P + 2) * Ci, P * Co)


def conv3x3_patch(x, kernel, bias=None, P=None):
    """3x3 stride-1 'same' conv on [B, T, F, Cin] via freq-packed
    block-Toeplitz matmuls. kernel: flax HWIO [3, 3, Cin, Cout]
    (H = time, W = freq). P defaults to 128 // Cout (full MXU lanes)."""
    B, T, F, Ci = x.shape
    Co = kernel.shape[-1]
    if P is None:
        P = min(8, 128 // Co)
    if P < 2:
        # nothing to pack (Co already fills the lanes), and the 2-row
        # tail halo below requires P >= 2: use the native conv
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if bias is None else y + bias
    nF = -(-F // P)
    Fp = nF * P
    # pad: 1 halo row at the freq front; P extra at the back so the
    # shifted tail reshape stays in-bounds; 1 halo frame each time end
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Fp + P - 1 - F), (0, 0)))
    # freq blocks with 2-row halo: block j covers padded rows
    # [j*P, j*P + P + 2) = original rows [j*P - 1, j*P + P + 1)
    a = xp[:, :, :Fp].reshape(B, T + 2, nF, P, Ci)
    tail = xp[:, :, P : Fp + P].reshape(B, T + 2, nF, P, Ci)[:, :, :, :2]
    xb = jnp.concatenate([a, tail], axis=3)  # [B, T+2, nF, P+2, Ci]
    flat = xb.reshape(B, T + 2, nF, (P + 2) * Ci)
    y = None
    for dt in range(3):
        term = flat[:, dt : T + dt] @ _banded(kernel[dt], P, Ci, Co)
        y = term if y is None else y + term
    y = y.reshape(B, T, nF * P, Co)[:, :, :F]
    if bias is not None:
        y = y + bias
    return y


class PatchConv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), stride 1, padding 1) with
    IDENTICAL param names/shapes ('kernel' [3,3,Cin,Cout], 'bias'
    [Cout]) so checkpoints interchange with the XLA-conv path."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        init = torch_linear_init(in_ch * 9)
        kernel = self.param("kernel", init, (3, 3, in_ch, self.features))
        bias = (
            self.param("bias", init, (self.features,))
            if self.use_bias else None
        )
        # compute dtype = input dtype (the r4 promotion-hygiene rule)
        kernel = kernel.astype(x.dtype)
        bias = None if bias is None else bias.astype(x.dtype)
        return conv3x3_patch(x, kernel, bias)
