"""wespeaker-layout ECAPA: conversion parity + recipe selection.

The torch twin below reproduces the micro-structure AND state_dict naming
of wespeaker/models/ecapa_tdnn.py — the external package the reference's
jointly-trained checkpoints embed (`from wespeaker.models.speaker_model
import get_speaker_model`, /root/reference/wesep/models/bsrnn.py:9,217) —
so `port_wespeaker_ecapa_state_dict` can be structure-tested offline
against a same-shaped torch module (the established parity-test pattern;
wespeaker itself is not installable here). Micro-structure pinned:
Res2 per-split conv->relu->BN with the last RAW split appended at the
END; SE_Res2Block as Sequential[conv_in, res2, conv_out, se] + residual;
ASTP with unbiased global-context std (+1e-10) and 1x1-conv attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class _Conv1dReluBn(nn.Module):
    def __init__(self, in_c, out_c, k=1, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(in_c, out_c, k, 1, padding, dilation)
        self.bn = nn.BatchNorm1d(out_c)

    def forward(self, x):
        return self.bn(F.relu(self.conv(x)))


class _Res2Conv1dReluBn(nn.Module):
    def __init__(self, channels, k=3, padding=0, dilation=1, scale=8):
        super().__init__()
        assert channels % scale == 0
        self.scale = scale
        self.width = channels // scale
        self.nums = scale if scale == 1 else scale - 1
        self.convs = nn.ModuleList([
            nn.Conv1d(self.width, self.width, k, 1, padding, dilation)
            for _ in range(self.nums)
        ])
        self.bns = nn.ModuleList([
            nn.BatchNorm1d(self.width) for _ in range(self.nums)
        ])

    def forward(self, x):
        out = []
        spx = torch.split(x, self.width, 1)
        sp = spx[0]
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            if i >= 1:
                sp = sp + spx[i]
            sp = conv(sp)
            sp = bn(F.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(spx[self.nums])
        return torch.cat(out, dim=1)


class _SEConnect(nn.Module):
    def __init__(self, channels, bottleneck=128):
        super().__init__()
        self.linear1 = nn.Linear(channels, bottleneck)
        self.linear2 = nn.Linear(bottleneck, channels)

    def forward(self, x):
        out = x.mean(dim=2)
        out = F.relu(self.linear1(out))
        out = torch.sigmoid(self.linear2(out))
        return x * out.unsqueeze(2)


class _SERes2Block(nn.Module):
    def __init__(self, channels, k, padding, dilation, scale):
        super().__init__()
        self.se_res2block = nn.Sequential(
            _Conv1dReluBn(channels, channels, 1),
            _Res2Conv1dReluBn(channels, k, padding, dilation, scale),
            _Conv1dReluBn(channels, channels, 1),
            _SEConnect(channels),
        )

    def forward(self, x):
        return x + self.se_res2block(x)


class _ASTP(nn.Module):
    def __init__(self, in_dim, bottleneck=128, global_context_att=False):
        super().__init__()
        self.global_context_att = global_context_att
        self.linear1 = nn.Conv1d(
            in_dim * 3 if global_context_att else in_dim, bottleneck, 1
        )
        self.linear2 = nn.Conv1d(bottleneck, in_dim, 1)

    def forward(self, x):
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


class _TorchEcapaWS(nn.Module):
    """wespeaker-named ECAPA_TDNN twin: forward takes (B, T, F)."""

    def __init__(self, channels=512, feat_dim=80, embed_dim=192,
                 global_context_att=False, emb_bn=False):
        super().__init__()
        self.layer1 = _Conv1dReluBn(feat_dim, channels, 5, padding=2)
        self.layer2 = _SERes2Block(channels, 3, 2, 2, 8)
        self.layer3 = _SERes2Block(channels, 3, 3, 3, 8)
        self.layer4 = _SERes2Block(channels, 3, 4, 4, 8)
        cat = channels * 3
        self.conv = nn.Conv1d(cat, cat, 1)
        self.pool = _ASTP(cat, 128, global_context_att)
        self.bn = nn.BatchNorm1d(cat * 2)
        self.linear = nn.Linear(cat * 2, embed_dim)
        self.emb_bn = emb_bn
        if emb_bn:
            self.bn2 = nn.BatchNorm1d(embed_dim)

    def _get_frame_level_feat(self, x):
        x = x.permute(0, 2, 1)
        out1 = self.layer1(x)
        out2 = self.layer2(out1)
        out3 = self.layer3(out2)
        out4 = self.layer4(out3)
        out = torch.cat([out2, out3, out4], dim=1)
        return F.relu(self.conv(out))

    def forward(self, x):
        out = self._get_frame_level_feat(x)
        out = self.bn(self.pool(out))
        out = self.linear(out)
        if self.emb_bn:
            out = self.bn2(out)
        return out


def _randomize_bn_stats(mod, gen):
    """Non-trivial running stats + affines so eval parity catches
    mean/var/scale/bias mapping swaps."""
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.normal_(0.0, 0.3, generator=gen)


@pytest.mark.parametrize("glob,emb_bn", [(True, False), (False, True)])
def test_wespeaker_ecapa_port_parity(glob, emb_bn):
    from wesep_tpu.models.speaker.ecapa_ws import ECAPA_TDNN_WS
    from wesep_tpu.utils.torch_port import port_wespeaker_ecapa_state_dict

    torch.manual_seed(3)
    gen = torch.Generator().manual_seed(4)
    twin = _TorchEcapaWS(
        channels=32, feat_dim=24, embed_dim=16,
        global_context_att=glob, emb_bn=emb_bn,
    )
    _randomize_bn_stats(twin, gen)
    twin.eval()
    x = torch.randn(3, 57, 24, generator=gen)
    with torch.no_grad():
        ref_emb = twin(x).numpy()
        ref_frame = twin._get_frame_level_feat(x).permute(0, 2, 1).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = port_wespeaker_ecapa_state_dict(sd)
    model = ECAPA_TDNN_WS(
        channels=32, embed_dim=16, global_context_att=glob, emb_bn=emb_bn
    )
    variables = {"params": params, "batch_stats": stats}
    emb = model.apply(variables, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, atol=2e-4, rtol=0)

    frame = model.apply(
        variables, jnp.asarray(x.numpy()), train=False,
        return_frame_feats=True,
    )
    np.testing.assert_allclose(np.asarray(frame), ref_frame, atol=2e-4,
                               rtol=0)


def test_layout_selectable_via_spk_args():
    """spk_args {layout: wespeaker} routes a joint BSRNN's speaker branch
    to the wespeaker-layout encoder (reference spk_args flow:
    bsrnn.py:217 `get_speaker_model(spk_model)(**spk_args)`)."""
    from wesep_tpu.models.bsrnn import BSRNN

    model = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        spk_model="ECAPA_TDNN_GLOB_c32", spk_feat=False,
        feat_type="consistent",
        spk_args={"embed_dim": 16, "feat_dim": 24, "layout": "wespeaker"},
        remat=False,
    )
    rng = jax.random.PRNGKey(0)
    wav = jnp.zeros((1, 4000), jnp.float32)
    variables = model.init(rng, wav, wav, train=False)
    spk = variables["params"]["spk_model_net"]
    # wespeaker fingerprint: per-split BNs inside the Res2 stage
    assert "bns_0" in spk["layer2"]["res2"]
    assert "batch_stats" in variables


def test_joint_bsrnn_checkpoint_roundtrip(tmp_path):
    """A joint (separator + wespeaker-ECAPA) state_dict ports into the
    flax joint model and reproduces the torch speaker branch through
    port_bsrnn_state_dict's spk_map hook."""
    from wesep_tpu.models.speaker.ecapa_ws import ECAPA_TDNN_WS
    from wesep_tpu.utils.torch_port import port_wespeaker_ecapa_state_dict

    torch.manual_seed(5)
    gen = torch.Generator().manual_seed(6)
    twin = _TorchEcapaWS(channels=32, feat_dim=24, embed_dim=16,
                         global_context_att=True)
    _randomize_bn_stats(twin, gen)
    twin.eval()
    # simulate a joint checkpoint: encoder keys under spk_model.*
    joint_sd = {
        f"spk_model.{k}": v.detach().numpy()
        for k, v in twin.state_dict().items()
    }
    spk_sd = {
        k.removeprefix("spk_model."): v
        for k, v in joint_sd.items()
        if k.startswith("spk_model.")
    }
    params, stats = port_wespeaker_ecapa_state_dict(spk_sd)
    x = torch.randn(2, 41, 24, generator=gen)
    with torch.no_grad():
        ref = twin(x).numpy()
    model = ECAPA_TDNN_WS(channels=32, embed_dim=16,
                          global_context_att=True)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=0)
