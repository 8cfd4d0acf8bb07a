"""wespeaker ResNet joint-branch conversion parity.

The torch twin reproduces the micro-structure AND state_dict naming of
wespeaker/models/resnet.py — the reference's DEFAULT joint speaker
encoder (spk_model 'ResNet34',
/root/reference/examples/librimix/tse/v2/confs/bsrnn.yaml:57-62, consumed
via get_speaker_model at /root/reference/wesep/models/bsrnn.py:9,217) —
so `port_wespeaker_resnet_state_dict` can be structure-tested offline
(the established pattern of tests/test_ecapa_ws.py; wespeaker itself is
not installable here). Micro-structure pinned: (B,T,F) -> permute ->
unsqueeze(1) NCHW stem; numbered `shortcut` Sequentials; pooling over the
(B, C*F, T) C-MAJOR flatten (the flax model flattens F-major — the port
permutes every C*F-sized weight dim, _cf_perm); TSTP std =
sqrt(unbiased var + 1e-7); ASTP without global context by default;
two-emb head with an affine-free BatchNorm1d.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != self.expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, self.expansion * planes, 1, stride,
                          bias=False),
                nn.BatchNorm2d(self.expansion * planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, self.expansion * planes, 1,
                               bias=False)
        self.bn3 = nn.BatchNorm2d(self.expansion * planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != self.expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, self.expansion * planes, 1, stride,
                          bias=False),
                nn.BatchNorm2d(self.expansion * planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class _TSTP(nn.Module):
    def forward(self, x):
        if x.dim() == 4:
            x = x.reshape(x.shape[0], x.shape[1] * x.shape[2], x.shape[3])
        mean = x.mean(dim=-1)
        std = torch.sqrt(torch.var(x, dim=-1) + 1e-7)
        return torch.cat((mean, std), dim=1)


class _ASTP(nn.Module):
    def __init__(self, in_dim, bottleneck=128, global_context_att=False):
        super().__init__()
        self.global_context_att = global_context_att
        self.linear1 = nn.Conv1d(
            in_dim * 3 if global_context_att else in_dim, bottleneck, 1
        )
        self.linear2 = nn.Conv1d(bottleneck, in_dim, 1)

    def forward(self, x):
        if x.dim() == 4:
            x = x.reshape(x.shape[0], x.shape[1] * x.shape[2], x.shape[3])
        if self.global_context_att:
            mean = torch.mean(x, dim=-1, keepdim=True).expand_as(x)
            std = torch.sqrt(
                torch.var(x, dim=-1, keepdim=True) + 1e-10
            ).expand_as(x)
            x_in = torch.cat((x, mean, std), dim=1)
        else:
            x_in = x
        alpha = torch.tanh(self.linear1(x_in))
        alpha = torch.softmax(self.linear2(alpha), dim=2)
        mean = torch.sum(alpha * x, dim=2)
        var = torch.sum(alpha * (x**2), dim=2) - mean**2
        std = torch.sqrt(var.clamp(min=1e-10))
        return torch.cat([mean, std], dim=1)


class _TorchResNetWS(nn.Module):
    """wespeaker-named ResNet twin: forward takes (B, T, F)."""

    def __init__(self, block, num_blocks, m_channels=32, feat_dim=40,
                 embed_dim=16, pooling_func="TSTP", two_emb_layer=True):
        super().__init__()
        self.two_emb_layer = two_emb_layer
        self.in_planes = m_channels
        self.conv1 = nn.Conv2d(1, m_channels, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = self._make_layer(block, m_channels, num_blocks[0], 1)
        self.layer2 = self._make_layer(block, 2 * m_channels,
                                       num_blocks[1], 2)
        self.layer3 = self._make_layer(block, 4 * m_channels,
                                       num_blocks[2], 2)
        self.layer4 = self._make_layer(block, 8 * m_channels,
                                       num_blocks[3], 2)
        stats_dim = int(feat_dim / 8) * m_channels * 8 * block.expansion
        if pooling_func == "TSTP":
            self.pool = _TSTP()
        else:
            self.pool = _ASTP(stats_dim)
        self.seg_1 = nn.Linear(stats_dim * 2, embed_dim)
        if two_emb_layer:
            self.seg_bn_1 = nn.BatchNorm1d(embed_dim, affine=False)
            self.seg_2 = nn.Linear(embed_dim, embed_dim)

    def _make_layer(self, block, planes, n, stride):
        layers = []
        for s in [stride] + [1] * (n - 1):
            layers.append(block(self.in_planes, planes, s))
            self.in_planes = planes * block.expansion
        return nn.Sequential(*layers)

    def forward(self, x):
        x = x.permute(0, 2, 1)  # (B, T, F) -> (B, F, T)
        x = x.unsqueeze_(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = self.layer3(out)
        out = self.layer4(out)
        stats = self.pool(out)
        embed_a = self.seg_1(stats)
        if self.two_emb_layer:
            out = F.relu(embed_a)
            out = self.seg_bn_1(out)
            embed_b = self.seg_2(out)
            return embed_a, embed_b
        return torch.tensor(0.0), embed_a


def _randomize_bn_stats(mod, gen):
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                if m.affine:
                    m.weight.uniform_(0.5, 1.5, generator=gen)
                    m.bias.normal_(0.0, 0.3, generator=gen)


@pytest.mark.parametrize(
    "block,flax_name,blocks,pooling,two_emb",
    [
        (_BasicBlock, "ResNet18", (2, 2, 2, 2), "TSTP", True),
        (_BasicBlock, "ResNet18", (2, 2, 2, 2), "ASTP", False),
        (_Bottleneck, "ResNet50", (3, 4, 6, 3), "TSTP", False),
    ],
)
def test_wespeaker_resnet_port_parity(block, flax_name, blocks, pooling,
                                      two_emb):
    from wesep_tpu.models.speaker import resnet
    from wesep_tpu.utils.torch_port import port_wespeaker_resnet_state_dict

    torch.manual_seed(20)
    gen = torch.Generator().manual_seed(21)
    feat_dim, emb, m = 40, 16, 8
    twin = _TorchResNetWS(
        block, list(blocks), m_channels=m, feat_dim=feat_dim,
        embed_dim=emb, pooling_func=pooling, two_emb_layer=two_emb,
    )
    _randomize_bn_stats(twin, gen)
    twin.eval()
    x = torch.randn(3, 53, feat_dim, generator=gen)
    with torch.no_grad():
        ref_a, ref_b = twin(x)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = port_wespeaker_resnet_state_dict(sd)
    model = getattr(resnet, flax_name)(
        m_channels=m, embed_dim=emb, pooling_func=pooling,
        two_emb_layer=two_emb,
    )
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy()), train=False,
    )
    if two_emb:
        got_a, got_b = out
        np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(),
                                   atol=3e-4, rtol=0)
        np.testing.assert_allclose(np.asarray(got_b), ref_b.numpy(),
                                   atol=3e-4, rtol=0)
    else:
        np.testing.assert_allclose(np.asarray(out), ref_b.numpy(),
                                   atol=3e-4, rtol=0)
