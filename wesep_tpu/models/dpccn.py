"""DPCCN: densely-connected pyramid U-Net TSE, NHWC TPU layout.

Functional redesign of /root/reference/wesep/models/dpccn.py and
/root/reference/wesep/modules/dpccn/convs.py. Feature maps are
channels-last [B, T, F, C] (NHWC — native XLA TPU conv layout; the
reference is NCHW [B, C, T, F]). Torch ConvTranspose2d padding semantics
are reproduced by VALID transposed convs + static slicing.

forward (reference dpccn.py:204-283):
  STFT (win 512 / hop 128) -> [B,2,T,F] conv2d(2->16) -> DenseBlock ->
  speaker fuse over the FREQ dim (feat_dim=257) -> 4x [Conv2dBlock
  stride (1,2) + DenseBlock] -> 3x Conv2dBlock to 384 ch (F: 257->...->3)
  -> 2x10 dilated TCN on flattened T*F -> mirror decoder w/ skip concat ->
  DenseBlock(dec) -> pyramid avg-pool (4,8,16,32) + bilinear upsample +
  1x1 proj -> deconv2d(32->2) -> complex iSTFT(length=nsample).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wesep_tpu.models.common import Dense, SpeakerFuse, SpeakerTransform
from wesep_tpu.ops.init import torch_linear_init
from wesep_tpu.ops.stft import hann_window, istft, stft

__all__ = ["DPCCN"]


def _pallas_ok():
    import os

    flag = os.environ.get("WESEP_CONV2D_PALLAS", "1")
    if flag == "0":
        return False
    from wesep_tpu.ops.pallas_conv2d import pallas_available

    return pallas_available() or flag == "force"


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d/1d defaults: per-(sample, channel) over spatial
    dims, NO affine params. x: [B, *spatial, C].

    Statistics reduce in f32 (XLA fuses the upcast into the reduction —
    no f32 copy of x is materialized), but the normalization itself stays
    in x.dtype: DPCCN applies IN after every conv (~60x per forward), so
    a materialized f32 intermediate would double the HBM traffic of the
    whole bandwidth-bound U-Net. In f32 training the math is unchanged;
    in bf16 the centering/scaling rounds to bf16, which is already the
    output precision."""
    axes = tuple(range(1, x.ndim - 1))
    # single-pass stats (E[x^2] - E[x]^2): the two reductions fuse into
    # one read of x, halving the stats passes of the ~60 INs per forward.
    # The square stays in the compute dtype (an x.astype(f32) upcast
    # would put the square's ADJOINT — a full-size stream — in f32, the
    # r4 gLN finding); the reductions accumulate f32.
    mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x), axis=axes, keepdims=True,
                  dtype=jnp.float32)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * scale


class Conv2dBlock(nn.Module):
    """conv2d -> ELU -> InstanceNorm2d (convs.py:28-47). NHWC.

    conv_impl="patch" routes stride-1 3x3 convs through the lane-packed
    block-Toeplitz matmul (ops/patch_conv.py; same param names/shapes,
    so checkpoints interchange): the dense convs' 16-64 output channels
    occupy <=50% of the MXU's 128 lanes in XLA's native conv."""

    out_dims: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        init = torch_linear_init(
            in_ch * self.kernel_size[0] * self.kernel_size[1]
        )
        plain3x3 = (
            self.kernel_size == (3, 3)
            and tuple(self.stride) == (1, 1)
            and tuple(self.padding) == (1, 1)
        )
        # the fused kernel wins only at narrow inputs (measured r4 shape
        # matrix, BASELINE.md: 1.75x at Ci=16, 1.18x at 32, 0.3-0.5x at
        # Ci>=80 where the (P+2)/3 FLOP inflation and small T-chunks
        # starve the MXU) — route wide-concat convs to XLA
        import os

        gate = int(os.environ.get("WESEP_CONV2D_CI_GATE", "32"))
        if (
            self.conv_impl == "pallas" and plain3x3 and in_ch <= gate
            and _pallas_ok()
        ):
            # fused conv+ELU+IN Pallas kernel: the post-ELU stream stays
            # in VMEM, so the IN stats/normalize passes cost no HBM
            # traffic (ops/pallas_conv2d.py). Identical param tree via a
            # dummy-call-bound nn.Conv.
            from wesep_tpu.ops.pallas_conv2d import conv2d_block_in

            conv = nn.Conv(
                self.out_dims, self.kernel_size, padding=[(1, 1), (1, 1)],
                kernel_init=init, bias_init=init, name="conv",
            )
            _ = conv(jnp.zeros((1, 1, 1, in_ch), x.dtype))
            kernel = conv.get_variable("params", "kernel")
            bias = conv.get_variable("params", "bias")
            return conv2d_block_in(x, kernel.astype(x.dtype), bias)
        if self.conv_impl == "patch" and plain3x3:
            from wesep_tpu.ops.patch_conv import PatchConv3x3

            y = PatchConv3x3(self.out_dims, name="conv")(x)
        else:
            y = nn.Conv(
                self.out_dims,
                self.kernel_size,
                strides=self.stride,
                padding=[(p, p) for p in self.padding],
                kernel_init=init,
                bias_init=init,
                name="conv",
                dtype=x.dtype,  # avoid f32 promotion against f32 params
            )(x)
        return instance_norm(nn.elu(y))


class ConvTrans2dBlock(nn.Module):
    """convtranspose2d -> ELU -> InstanceNorm2d (convs.py:50-70).

    torch padding p / output_padding op are reproduced by a VALID
    transposed conv + slice [p : (i-1)*s + k - p + op].
    """

    out_dims: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        init = torch_linear_init(
            self.out_dims * self.kernel_size[0] * self.kernel_size[1]
        )
        y = nn.ConvTranspose(
            self.out_dims,
            self.kernel_size,
            strides=self.stride,
            padding="VALID",
            transpose_kernel=True,
            kernel_init=init,
            bias_init=init,
            name="conv",
            dtype=x.dtype,
        )(x)
        slices = [slice(None)]
        for d in range(2):
            i = x.shape[1 + d]
            full = (i - 1) * self.stride[d] + self.kernel_size[d]
            out = full - 2 * self.padding[d] + self.output_padding[d]
            slices.append(slice(self.padding[d], self.padding[d] + out))
        y = y[tuple(slices)]
        return instance_norm(nn.elu(y))


class DenseBlock(nn.Module):
    """5-layer dense concat block (convs.py:73-103)."""

    in_dims: int
    out_dims: int
    mode: str = "enc"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        outs = [x]
        for i in range(5):
            out_d = self.in_dims if i < 4 else self.out_dims
            y = Conv2dBlock(
                out_d, conv_impl=self.conv_impl, name=f"conv{i + 1}"
            )(jnp.concatenate(outs, axis=-1))
            outs.append(y)
        return outs[-1]


class TCNBlock(nn.Module):
    """IN -> ELU -> depthwise dilated conv -> IN -> ELU -> 1x1, residual
    (convs.py:106-152). x: [B, L, C]."""

    dims: int = 384
    kernel_size: int = 3
    dilation: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (
            self.dilation * (self.kernel_size - 1) // 2
            if not self.causal
            else self.dilation * (self.kernel_size - 1)
        )
        from wesep_tpu.models.common import Conv1d

        y = nn.elu(instance_norm(x))
        # depthwise: Conv1d lowers it as shifted multiply-adds (TPU-fast)
        y = Conv1d(
            self.dims,
            self.kernel_size,
            dilation=self.dilation,
            groups=self.dims,
            padding=[(pad, pad)] if not self.causal else [(pad, 0)],
            name="dconv1",
        )(y)
        y = nn.elu(instance_norm(y))
        y = Dense(self.dims, name="dconv2")(y)
        return x + y


class DPCCN(nn.Module):
    """Reference constructor parity (dpccn.py:18-47)."""

    win: int = 512
    stride: int = 128
    spk_emb_dim: int = 256
    sr: int = 16000
    use_spk_transform: bool = False
    spk_fuse_type: str = "multiply"
    feature_dim: int = 257
    kernel_size: Tuple[int, int] = (3, 3)
    stride1: Tuple[int, int] = (1, 1)
    stride2: Tuple[int, int] = (1, 2)
    paddings: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    tcn_dims: int = 384
    tcn_blocks: int = 10
    tcn_layers: int = 2
    causal: bool = False
    pool_size: Sequence[int] = (4, 8, 16, 32)
    multi_fuse: bool = False
    joint_training: bool = True
    multi_task: bool = False
    spksInTrain: int = 251
    spk_model: Optional[str] = None
    spk_model_init: Optional[str] = None
    spk_model_freeze: bool = False
    spk_args: Optional[dict] = None
    spk_feat: bool = False
    feat_type: str = "consistent"
    # "patch" routes the dense stride-1 3x3 convs through the
    # lane-packed block-Toeplitz matmul (ops/patch_conv.py)
    conv_impl: str = "xla"

    def _spk_embedding(self, enroll, train: bool):
        """Shared enrollment branch (dpccn.py:225-243 == bsrnn.py:341-357)."""
        spk_logits = None
        if self.joint_training:
            feats = enroll
            if not self.spk_feat and self.feat_type == "consistent":
                from wesep_tpu.ops.fbank import speaker_feat

                n_mels = (self.spk_args or {}).get("feat_dim", 80)
                feats = jax.lax.stop_gradient(
                    speaker_feat(
                        enroll,
                        sample_rate=self.sr,
                        n_fft=self.win,
                        hop_length=self.stride,
                        n_mels=n_mels,
                    )
                )
            from wesep_tpu.models.speaker import get_speaker_model

            args = dict(self.spk_args or {})
            args.pop("feat_dim", None)
            embed = get_speaker_model(self.spk_model)(
                name="spk_model", **args
            )(feats, train=train)
            if isinstance(embed, (tuple, list)):
                embed = embed[-1]
            if self.multi_task:
                spk_logits = Dense(self.spksInTrain, name="pred_linear")(embed)
        else:
            embed = enroll
        return embed, spk_logits

    @nn.compact
    def __call__(self, mix, enroll, train: bool = True):
        b, nsample = mix.shape
        window = hann_window(self.win)
        re, im = stft(mix, self.win, self.stride, window=window)  # [B,T,F]
        x = jnp.stack([re, im], axis=-1)  # [B, T, F, 2] (NHWC)

        init0 = torch_linear_init(
            2 * self.kernel_size[0] * self.kernel_size[1]
        )
        out = nn.Conv(
            16, self.kernel_size, strides=self.stride1,
            padding=[(p, p) for p in self.paddings],
            kernel_init=init0, bias_init=init0, name="conv2d",
            dtype=x.dtype,
        )(x)
        out = DenseBlock(16, 16, "enc", conv_impl=self.conv_impl,
                         name="enc0")(out)

        embed, spk_logits = self._spk_embedding(enroll, train)
        if self.use_spk_transform:
            embed = SpeakerTransform(self.spk_emb_dim, name="spk_transform")(
                embed
            )

        # fuse over the FREQUENCY dim: [B,T,F,C] -> [B,T,C,F], fuse, back
        # (reference fuses out.transpose(2,3) with feat_dim=257,
        # dpccn.py:252)
        out_p = jnp.swapaxes(out, 2, 3)
        out_p = SpeakerFuse(self.feature_dim, self.spk_fuse_type,
                            name="spk_fuse")(out_p, embed)
        out = jnp.swapaxes(out_p, 2, 3)

        skips = [out]
        # encoder: 4x [conv stride(1,2) + dense] then 3 convs to 384
        for i in range(4):
            out = Conv2dBlock(
                32, self.kernel_size, self.stride2, self.paddings,
                name=f"enc{i + 1}_conv",
            )(out)
            out = DenseBlock(32, 32, "enc", conv_impl=self.conv_impl,
                             name=f"enc{i + 1}_dense")(out)
            skips.append(out)
        for j, ch in enumerate((64, 128, 384)):
            out = Conv2dBlock(
                ch, self.kernel_size, self.stride2, self.paddings,
                name=f"enc{5 + j}",
            )(out)
            skips.append(out)

        # TCN on flattened [B, T*F, C]
        bt, t, f, c = out.shape
        y = out.reshape(bt, t * f, c)
        for layer in range(self.tcn_layers):
            for blk in range(self.tcn_blocks):
                y = TCNBlock(
                    self.tcn_dims, 3, 2**blk, self.causal,
                    name=f"tcn_{layer}_{blk}",
                )(y)
        out = y.reshape(bt, t, f, c)

        # decoder with skip concat (reverse order)
        skips = skips[::-1]
        for j, ch in enumerate((128, 64, 32)):
            out = ConvTrans2dBlock(
                ch, self.kernel_size, self.stride2, self.paddings,
                self.output_padding, name=f"dec{j}",
            )(jnp.concatenate([skips[j], out], axis=-1))
        for i in range(4):
            out = DenseBlock(32, 64, "dec", conv_impl=self.conv_impl,
                             name=f"dec{3 + i}_dense")(
                jnp.concatenate([skips[3 + i], out], axis=-1)
            )
            out = ConvTrans2dBlock(
                32 if i != 3 else 16, self.kernel_size, self.stride2,
                self.paddings, self.output_padding, name=f"dec{3 + i}_conv",
            )(out)
        out = DenseBlock(16, 32, "dec", conv_impl=self.conv_impl,
                         name="dec7")(
            jnp.concatenate([skips[7], out], axis=-1)
        )

        # pyramid pooling: avg_pool(sz) -> 1x1 conv(32->8) -> bilinear up
        bt, t, f, c = out.shape
        pools = [out]
        for pi, sz in enumerate(self.pool_size):
            p = nn.avg_pool(out, (sz, sz), strides=(sz, sz))
            p = Dense(8, name=f"avg_pool_{pi}")(p)
            p = jax.image.resize(
                p, (bt, t, f, 8), method="bilinear"
            )
            pools.append(p)
        out = jnp.concatenate(pools, axis=-1)
        out = Dense(32, name="avg_proj")(out)

        # deconv2d 32 -> 2 (stride 1, pad 1 -> same spatial size)
        init_d = torch_linear_init(
            2 * self.kernel_size[0] * self.kernel_size[1]
        )
        y = nn.ConvTranspose(
            2, self.kernel_size, strides=self.stride1, padding="VALID",
            transpose_kernel=True, kernel_init=init_d, bias_init=init_d,
            name="deconv2d", dtype=out.dtype,
        )(out)
        y = y[:, self.paddings[0] : self.paddings[0] + t,
              self.paddings[1] : self.paddings[1] + f]

        est_re, est_im = y[..., 0], y[..., 1]  # [B, T, F]
        s = istft(
            est_re, est_im, self.win, self.stride, window=window,
            length=nsample,
        )
        return s, spk_logits
