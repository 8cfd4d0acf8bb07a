"""wespeaker CAMPPlus joint-branch conversion parity.

The torch twin reproduces the micro-structure AND state_dict naming of
wespeaker/models/campplus.py (itself after alibaba-damo 3D-Speaker's
D-TDNN CAM++, arXiv:2303.00332) — the 'CAMPPlus' spk_model option in the
reference's joint configs
(/root/reference/examples/voxceleb1/v2/confs/bsrnn_online.yaml:69-75,
consumed via get_speaker_model at
/root/reference/wesep/models/bsrnn.py:9,217) — so
`port_wespeaker_campplus_state_dict` can be structure-tested offline
(the established pattern of tests/test_resnet_ws.py; wespeaker itself is
not installable here). Micro-structure pinned:

  * FCM: conv1 3x3 stride 1, two layers of two BasicResBlocks with
    FREQ-only strides (2,1)/(1,1) and numbered `shortcut` Sequentials,
    final conv2 3x3 stride (2,1), then the C-MAJOR flatten
    (B, C, F', T) -> (B, C*F', T).
  * xvector Sequential: tdnn = Conv1d(k=5, stride=2, pad=2, no bias) +
    BN + relu; block1..3 of CAMDenseTDNNLayers named tdnnd1.. (1-indexed)
    with nonlinear1(BN+relu) -> linear1(1x1 no bias) -> nonlinear2 ->
    cam_layer; transit1..3 = BN + relu + channel-halving 1x1 (no bias);
    out_nonlinear = BN + relu; TSTP stats; dense = 1x1 (no bias) +
    AFFINE-FREE BatchNorm1d.
  * CAMLayer: dilated linear_local (no bias), context = time-mean +
    ceil-mode avg_pool1d segment means (seg_len 100 — the LAST segment
    averages only the remaining frames), gate = sigmoid(linear2(relu(
    linear1(ctx)))) with biased 1x1s.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _get_nonlinear(config_str, channels):
    out = nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            out.add_module("relu", nn.ReLU(inplace=True))
        elif name == "batchnorm":
            out.add_module("batchnorm", nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            out.add_module(
                "batchnorm", nn.BatchNorm1d(channels, affine=False)
            )
        else:
            raise ValueError(name)
    return out


class _BasicResBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=(stride, 1),
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != self.expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, self.expansion * planes, 1,
                          stride=(stride, 1), bias=False),
                nn.BatchNorm2d(self.expansion * planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class _FCM(nn.Module):
    def __init__(self, m_channels=32, feat_dim=80):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = nn.Sequential(
            _BasicResBlock(m_channels, m_channels, 2),
            _BasicResBlock(m_channels, m_channels, 1),
        )
        self.layer2 = nn.Sequential(
            _BasicResBlock(m_channels, m_channels, 2),
            _BasicResBlock(m_channels, m_channels, 1),
        )
        self.conv2 = nn.Conv2d(m_channels, m_channels, 3, stride=(2, 1),
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def forward(self, x):
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        shape = out.shape
        return out.reshape(shape[0], shape[1] * shape[2], shape[3])


class _TDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1,
                 config_str="batchnorm-relu"):
        super().__init__()
        padding = (k - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_ch, out_ch, k, stride=stride,
                                padding=padding, dilation=dilation,
                                bias=False)
        self.nonlinear = _get_nonlinear(config_str, out_ch)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class _CAMLayer(nn.Module):
    def __init__(self, bn_channels, out_channels, k, dilation,
                 reduction=2):
        super().__init__()
        padding = (k - 1) // 2 * dilation
        self.linear_local = nn.Conv1d(bn_channels, out_channels, k,
                                      padding=padding, dilation=dilation,
                                      bias=False)
        self.linear1 = nn.Conv1d(bn_channels, bn_channels // reduction, 1)
        self.relu = nn.ReLU(inplace=True)
        self.linear2 = nn.Conv1d(bn_channels // reduction, out_channels, 1)
        self.sigmoid = nn.Sigmoid()

    def seg_pooling(self, x, seg_len=100):
        seg = F.avg_pool1d(x, kernel_size=seg_len, stride=seg_len,
                           ceil_mode=True)
        shape = seg.shape
        seg = (seg.unsqueeze(-1).expand(*shape, seg_len)
               .reshape(*shape[:-1], -1))
        return seg[..., : x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = self.relu(self.linear1(context))
        m = self.sigmoid(self.linear2(context))
        return y * m


class _CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bn_ch, k, dilation=1,
                 config_str="batchnorm-relu"):
        super().__init__()
        self.nonlinear1 = _get_nonlinear(config_str, in_ch)
        self.linear1 = nn.Conv1d(in_ch, bn_ch, 1, bias=False)
        self.nonlinear2 = _get_nonlinear(config_str, bn_ch)
        self.cam_layer = _CAMLayer(bn_ch, out_ch, k, dilation)

    def forward(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class _CAMDenseTDNNBlock(nn.ModuleList):
    def __init__(self, num_layers, in_ch, out_ch, bn_ch, k, dilation,
                 config_str="batchnorm-relu"):
        super().__init__()
        for i in range(num_layers):
            layer = _CAMDenseTDNNLayer(
                in_ch + i * out_ch, out_ch, bn_ch, k, dilation, config_str
            )
            self.add_module("tdnnd%d" % (i + 1), layer)

    def forward(self, x):
        for layer in self:
            x = torch.cat([x, layer(x)], dim=1)
        return x


class _TransitLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        self.nonlinear = _get_nonlinear(config_str, in_ch)
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=bias)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=bias)
        self.nonlinear = _get_nonlinear(config_str, out_ch)

    def forward(self, x):
        if len(x.shape) == 2:
            return self.nonlinear(self.linear(x.unsqueeze(-1)).squeeze(-1))
        return self.nonlinear(self.linear(x))


class _TSTP(nn.Module):
    def forward(self, x):
        mean = x.mean(dim=-1)
        std = torch.sqrt(x.var(dim=-1) + 1e-7)
        return torch.cat([mean, std], dim=-1)


class _TorchCAMPPlusWS(nn.Module):
    def __init__(self, feat_dim=80, embed_dim=192, growth_rate=32,
                 bn_size=4, init_channels=128,
                 stages=((12, 1), (24, 2), (16, 2)),
                 config_str="batchnorm-relu"):
        super().__init__()
        self.head = _FCM(m_channels=32, feat_dim=feat_dim)
        channels = self.head.out_channels
        from collections import OrderedDict

        self.xvector = nn.Sequential(OrderedDict([
            ("tdnn", _TDNNLayer(channels, init_channels, 5, stride=2,
                                config_str=config_str)),
        ]))
        channels = init_channels
        for i, (num_layers, dilation) in enumerate(stages):
            block = _CAMDenseTDNNBlock(
                num_layers, channels, growth_rate, bn_size * growth_rate,
                3, dilation, config_str,
            )
            self.xvector.add_module("block%d" % (i + 1), block)
            channels = channels + num_layers * growth_rate
            self.xvector.add_module(
                "transit%d" % (i + 1),
                _TransitLayer(channels, channels // 2, bias=False,
                              config_str=config_str),
            )
            channels //= 2
        self.xvector.add_module(
            "out_nonlinear", _get_nonlinear(config_str, channels)
        )
        self.xvector.add_module("stats", _TSTP())
        self.xvector.add_module(
            "dense",
            _DenseLayer(channels * 2, embed_dim, config_str="batchnorm_"),
        )

    def forward(self, x):
        x = x.permute(0, 2, 1)  # (B, T, F) -> (B, F, T)
        x = self.head(x)
        return self.xvector(x)


def _randomize_bn_stats(mod, gen):
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                if m.affine:
                    m.weight.uniform_(0.5, 1.5, generator=gen)
                    m.bias.normal_(0.0, 0.3, generator=gen)


@pytest.mark.parametrize("t", [53, 200])
def test_wespeaker_campplus_port_parity(t):
    """t=53 (< seg_len: context = 2x global-ish mean) and t=200 exercise
    the exact-multiple segment path; the non-multiple tail is pinned by
    test_seg_pooling_ceil_mode below."""
    from wesep_tpu.models.speaker.campplus import CAMPPlus
    from wesep_tpu.utils.torch_port import (
        port_wespeaker_campplus_state_dict,
    )

    torch.manual_seed(30)
    gen = torch.Generator().manual_seed(31)
    feat_dim, emb = 40, 16
    # small stage plan keeps the test fast while covering every
    # structural element (multi-layer dense blocks, dilation, transits)
    stages = ((2, 1), (3, 2), (2, 2))
    twin = _TorchCAMPPlusWS(
        feat_dim=feat_dim, embed_dim=emb, growth_rate=4, bn_size=2,
        init_channels=16, stages=stages,
    )
    _randomize_bn_stats(twin, gen)
    twin.eval()
    x = torch.randn(3, t, feat_dim, generator=gen)
    with torch.no_grad():
        want = twin(x).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = port_wespeaker_campplus_state_dict(sd)
    model = CAMPPlus(
        feat_dim=feat_dim, embed_dim=emb, growth_rate=4, bn_size=2,
        init_channels=16, stages=stages,
    )
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=0)


def test_seg_pooling_ceil_mode():
    """_seg_mean matches F.avg_pool1d(ceil_mode=True)+expand for a
    non-multiple length (the last segment averages the REMAINING
    frames, not a padded window)."""
    from wesep_tpu.models.speaker.campplus import _seg_mean

    torch.manual_seed(5)
    x = torch.randn(2, 8, 250)  # (B, C, T), T % 100 != 0
    cam = _CAMLayer(8, 8, 3, 1)
    want = cam.seg_pooling(x).numpy()  # (B, C, T)
    got = np.asarray(
        _seg_mean(jnp.asarray(x.numpy().transpose(0, 2, 1)), 100)
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
