"""BSRNN_Feats: tfmap_spec / tfmap_emb / cross-attention fusion paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _run(model, b=2, t=4000, enroll_t=3200, seed=0):
    rng = np.random.default_rng(seed)
    mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(
        rng.standard_normal((b, enroll_t)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), mix, enroll, train=False)
    if "batch_stats" in variables:
        out, _ = model.apply(
            variables, mix, enroll, train=True, mutable=["batch_stats"]
        )
    else:
        out = model.apply(variables, mix, enroll, train=True)
    return out


def test_tfmap_spec():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=False,
        spectral_feat="tfmap_spec",
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))


@pytest.mark.slow  # 55s smoke superseded by reference-parity variants
def test_cross_attention_fuse_with_ecapa():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=16,
        num_repeat=2,
        use_spk_transform=False,
        spk_fuse_type="cross_multiply",
        multi_fuse=True,
        joint_training=True,
        spk_model="ECAPA_TDNN_GLOB_c512",
        spk_args={"feat_dim": 80, "embed_dim": 32},
        spectral_feat=None,
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))


def test_tfmap_emb_with_ecapa():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="cross_additive",
        multi_fuse=False,
        joint_training=True,
        spk_model="ECAPA_TDNN_GLOB_c512",
        spk_args={"feat_dim": 80, "embed_dim": 32},
        spectral_feat="tfmap_emb",
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))


# ---- golden weight-port parity vs the reference torch model -----------------
#
# /root/reference/wesep/models/bsrnn_feats.py:201-578. Three cue paths:
# tfmap_spec (cosine-attention TF map from enrollment magnitudes, :386-409),
# tfmap_emb (attention scored by ECAPA frame-level features, :411-491), and
# cross_* fusion (frame-level features cross-attended into every band,
# :87-108, :167-187). The separator/BN/mask port reuses test_bsrnn's
# mapping; the extras below port attenFuse (Linear + nn.MultiheadAttention)
# and the cross SpeakerFuseLayer.


torch = pytest.importorskip("torch")


def _install(with_ecapa=False, channels=32):
    import ref_compat

    ref_compat.install_reference()
    if with_ecapa:
        from test_ecapa_ws import _TorchEcapaWS

        ref_compat.register_speaker_model(
            f"ECAPA_TDNN_GLOB_c{channels}",
            lambda feat_dim, embed_dim, **_kw: _TorchEcapaWS(
                channels=channels, feat_dim=feat_dim, embed_dim=embed_dim,
                global_context_att=True,
            ),
        )
    from wesep.models.bsrnn_feats import BSRNN_Feats as RefFeats

    return RefFeats


class _FrameEcapa(torch.nn.Module):
    """ECAPA twin whose forward() returns FRAME-LEVEL features [B, C, S].

    The reference tfmap_emb path calls the full spk_model forward and then
    treats the result as frame-level features (normalize over dim=1 +
    transpose + per-frame attention, bsrnn_feats.py:456-472) — the code
    only runs when the speaker model emits [B, C, S]. wesep_tpu reads the
    same features via return_frame_feats=True, so this twin pins the two
    interpretations to each other.
    """

    def __init__(self, feat_dim, embed_dim, channels=32, **_kw):
        super().__init__()
        from test_ecapa_ws import _TorchEcapaWS

        self.inner = _TorchEcapaWS(
            channels=channels, feat_dim=feat_dim, embed_dim=embed_dim,
            global_context_att=True,
        )

    def state_dict(self, *a, **k):  # port as a bare wespeaker encoder
        return self.inner.state_dict(*a, **k)

    def _get_frame_level_feat(self, x):
        return self.inner._get_frame_level_feat(x)

    def forward(self, x):
        return self.inner._get_frame_level_feat(x)


def _port_feats(ref, groups, num_repeat, multi_fuse, feature_dim):
    """Port through the PRODUCTION converter (state-dict based) so these
    goldens double as converter round-trip coverage."""
    del groups, feature_dim  # derived inside the converter
    import jax
    import jax.numpy as jnp

    from wesep_tpu.utils.torch_port import port_bsrnn_feats_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_bsrnn_feats_state_dict(
        sd,
        sr=ref.sr,
        win=ref.win,
        num_repeat=num_repeat,
        multi_fuse=multi_fuse,
        use_spk_transform=not isinstance(
            ref.spk_transform, torch.nn.Identity
        ),
        spk_fuse_type=ref.spk_fuse_type,
    )
    return jax.tree_util.tree_map(jnp.asarray, params)


def _ecapa_variables(ref, params):
    import jax
    import jax.numpy as jnp

    from wesep_tpu.utils.torch_port import port_wespeaker_ecapa_state_dict

    spk_sd = {
        k: v.detach().numpy() for k, v in ref.spk_model.state_dict().items()
    }
    spk_params, spk_stats = port_wespeaker_ecapa_state_dict(spk_sd)
    params["spk_model_net"] = jax.tree_util.tree_map(jnp.asarray, spk_params)
    return {
        "params": params,
        "batch_stats": {
            "spk_model_net": jax.tree_util.tree_map(jnp.asarray, spk_stats)
        },
    }


@pytest.mark.slow  # 58s; cross_fuse/tfmap_emb reference parity stays fast
def test_tfmap_spec_matches_reference():
    """tfmap_spec cue + consistent melspec -> ECAPA embedding + multiply
    fuse: waveform parity at the flagship bar."""
    from test_ecapa_ws import _randomize_bn_stats

    from wesep_tpu.models import get_model
    from wesep_tpu.models.bsrnn import band_layout

    RefFeats = _install(with_ecapa=True)
    torch.manual_seed(7)
    spk_args = {"feat_dim": 40, "embed_dim": 16}
    kwargs = dict(
        spk_emb_dim=16,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=16,
        num_repeat=1,
        use_spk_transform=False,
        spectral_feat="tfmap_spec",
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=True,
        multi_task=False,
        spk_model="ECAPA_TDNN_GLOB_c32",
        spk_feat=False,
        feat_type="consistent",
    )
    ref = RefFeats(**{**kwargs, "spk_args": spk_args, "spksInTrain": 17})
    _randomize_bn_stats(ref.spk_model, torch.Generator().manual_seed(8))
    ref.eval()

    model = get_model("BSRNN_Feats")(
        **kwargs, spk_args={**spk_args, "layout": "wespeaker"}, remat=False
    )
    groups = band_layout(16000, 512 // 2 + 1)
    variables = _ecapa_variables(
        ref, _port_feats(ref, groups, 1, False, 16)
    )

    rng = np.random.default_rng(9)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(enroll))
    est, _ = model.apply(
        variables, jnp.asarray(mix), jnp.asarray(enroll), train=False
    )
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )


def test_cross_fuse_matches_reference():
    """cross_multiply fusion from _get_frame_level_feat (spk_feat=True
    fbank enrollment): Linear + MultiheadAttention + fuse wiring parity.

    The reference hardcodes spk_emb_frame_dim=512 (bsrnn_feats.py:133);
    the offline-sized ECAPA twin emits 96-dim frames, so the test swaps
    the reference's attenFuse Linear for the twin-sized one post-ctor —
    same code path, config-level shape fix only.
    """
    from test_ecapa_ws import _randomize_bn_stats

    from wesep_tpu.models import get_model
    from wesep_tpu.models.bsrnn import band_layout

    RefFeats = _install(with_ecapa=True)
    torch.manual_seed(10)
    feat_dim, n = 40, 16
    spk_args = {"feat_dim": feat_dim, "embed_dim": 16}
    kwargs = dict(
        spk_emb_dim=16,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=n,
        num_repeat=2,
        use_spk_transform=False,
        spectral_feat=False,
        spk_fuse_type="cross_multiply",
        multi_fuse=False,
        joint_training=True,
        multi_task=False,
        spk_model="ECAPA_TDNN_GLOB_c32",
        spk_feat=True,
        feat_type="raw",
    )
    ref = RefFeats(**{**kwargs, "spk_args": spk_args, "spksInTrain": 17})
    ref.separator.attenFuse[0] = torch.nn.Linear(3 * 32, n)
    _randomize_bn_stats(ref.spk_model, torch.Generator().manual_seed(11))
    ref.eval()

    model = get_model("BSRNN_Feats")(
        **{**kwargs, "spectral_feat": None},
        spk_args={**spk_args, "layout": "wespeaker"},
        remat=False,
    )
    groups = band_layout(16000, 512 // 2 + 1)
    variables = _ecapa_variables(
        ref, _port_feats(ref, groups, 2, False, n)
    )

    rng = np.random.default_rng(12)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    enroll_fbank = rng.standard_normal((2, 37, feat_dim)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out, _ = ref(
            torch.from_numpy(mix), torch.from_numpy(enroll_fbank)
        )
    est, _ = model.apply(
        variables, jnp.asarray(mix), jnp.asarray(enroll_fbank), train=False
    )
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )


def test_tfmap_emb_cross_matches_reference():
    """tfmap_emb (ECAPA frame-feature-scored TF map) + cross_additive:
    the highest-divergence-risk path in the zoo (VERDICT r3 #4).

    The reference's spk_model full-forward is expected to emit
    frame-level [B, C, S] here (see _FrameEcapa); its kaldi fbank goes
    through the ref_compat bridge, so the fbank itself is validated by
    tests/test_fbank.py, and this test pins everything around it.
    """
    import ref_compat
    from test_ecapa_ws import _randomize_bn_stats

    from wesep_tpu.models import get_model
    from wesep_tpu.models.bsrnn import band_layout

    RefFeats = _install()
    ref_compat.register_speaker_model("FRAME_ECAPA_c32", _FrameEcapa)
    torch.manual_seed(13)
    # the reference's tfmap_emb fbank hardcodes num_mel_bins=80
    # (bsrnn_feats.py:439-452 calls compute_fbank with defaults), so 80 is
    # the only feat_dim at which the reference path is runnable
    feat_dim, n = 80, 16
    spk_args = {"feat_dim": feat_dim, "embed_dim": 16}
    kwargs = dict(
        spk_emb_dim=16,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=n,
        num_repeat=1,
        use_spk_transform=False,
        spectral_feat="tfmap_emb",
        spk_fuse_type="cross_additive",
        multi_fuse=False,
        joint_training=True,
        multi_task=False,
        spk_feat=False,
        feat_type="consistent",
    )
    ref = RefFeats(
        **{**kwargs, "spk_model": "FRAME_ECAPA_c32", "spk_args": spk_args,
           "spksInTrain": 17}
    )
    ref.separator.attenFuse[0] = torch.nn.Linear(3 * 32, n)
    _randomize_bn_stats(ref.spk_model, torch.Generator().manual_seed(14))
    ref.eval()

    model = get_model("BSRNN_Feats")(
        **kwargs,
        spk_model="ECAPA_TDNN_GLOB_c32",
        spk_args={**spk_args, "layout": "wespeaker"},
        remat=False,
    )
    groups = band_layout(16000, 512 // 2 + 1)
    variables = _ecapa_variables(
        ref, _port_feats(ref, groups, 1, False, n)
    )

    rng = np.random.default_rng(15)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(enroll))
    est, _ = model.apply(
        variables, jnp.asarray(mix), jnp.asarray(enroll), train=False
    )
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )
