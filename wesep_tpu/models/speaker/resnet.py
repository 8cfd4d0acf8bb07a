"""ResNet speaker encoders (wespeaker-compatible topology), NHWC layout.

Equivalent of wespeaker's resnet.py family consumed by the reference
(spk_model 'ResNet34' etc., examples/librimix/tse/v2/confs/bsrnn.yaml:57-62).
TPU-first choices: fbank input [B, T, F] becomes an NHWC map
[B, F, T, 1] (freq=H on sublanes, channels last on lanes) so every conv
lowers to an MXU matmul without layout transposes.

Topology: conv3x3(1->m) + BN + relu, 4 stages of Basic/Bottleneck blocks
(strides 1/2/2/2, channels m/2m/4m/8m), flatten (C x F/8) per frame,
temporal pooling (TSTP/ASTP/...), linear -> embedding
(optional two-emb-layer head: relu + BN + second linear).
"""

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from wesep_tpu.models.speaker.pooling import get_pooling

__all__ = [
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "ResNet152",
]


class BasicBlock(nn.Module):
    expansion = 1
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y).astype(y.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y).astype(y.dtype)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                name="shortcut_bn",
            )(residual).astype(residual.dtype)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    expansion = 4
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y).astype(y.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y).astype(y.dtype)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn3")(y).astype(y.dtype)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                name="shortcut_bn",
            )(residual).astype(residual.dtype)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    block: Type[nn.Module]
    num_blocks: Sequence[int]
    m_channels: int = 32
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True):
        """feats: [B, T, F_mel] -> embedding [B, embed_dim]."""
        # NHWC with freq as H: [B, F, T, 1]
        x = jnp.swapaxes(feats, 1, 2)[..., None]
        x = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x).astype(x.dtype)
        x = nn.relu(x)
        for stage, (n, stride) in enumerate(
            zip(self.num_blocks, (1, 2, 2, 2))
        ):
            planes = self.m_channels * (2**stage)
            for i in range(n):
                x = self.block(
                    planes,
                    stride=stride if i == 0 else 1,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
        # [B, F', T', C] -> frame-level [B, T', F'*C]
        b, f, t, c = x.shape
        x = jnp.swapaxes(x, 1, 2).reshape(b, t, f * c)
        pooled = get_pooling(self.pooling_func)(name="pool")(x, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            y = nn.relu(embed_a)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                use_scale=False, use_bias=False, name="seg_bn_1",
            )(y).astype(y.dtype)
            embed_b = nn.Dense(self.embed_dim, name="seg_2")(y)
            return embed_a, embed_b
        return embed_a


def _resnet(block, blocks):
    def ctor(m_channels: int = 32, embed_dim: int = 128,
             pooling_func: str = "TSTP", two_emb_layer: bool = True,
             name=None, **_ignored):
        return ResNet(
            block=block,
            num_blocks=blocks,
            m_channels=m_channels,
            embed_dim=embed_dim,
            pooling_func=pooling_func,
            two_emb_layer=two_emb_layer,
            name=name,
        )

    return ctor


ResNet18 = _resnet(BasicBlock, (2, 2, 2, 2))
ResNet34 = _resnet(BasicBlock, (3, 4, 6, 3))
ResNet50 = _resnet(Bottleneck, (3, 4, 6, 3))
ResNet101 = _resnet(Bottleneck, (3, 4, 23, 3))
ResNet152 = _resnet(Bottleneck, (3, 8, 36, 3))
