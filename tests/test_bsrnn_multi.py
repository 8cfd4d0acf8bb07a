"""BSRNN_Multi (SSA): two-pass training contract + torch golden parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _model():
    from wesep_tpu.models import get_model

    cls = get_model("BSRNN_Multi")
    return cls(
        spk_emb_dim=32,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=True,
        multi_task=True,
        spksInTrain=7,
        spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "pooling_func": "TSTP",
                  "two_emb_layer": False},
        remat=False,
    )


def test_ssa_two_pass_outputs_and_loss():
    from wesep_tpu.train.losses import ce_loss, si_sdr_loss
    from wesep_tpu.train.trainer import weighted_loss

    model = _model()
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(
        rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), mix, enroll, train=True)

    outs, logits = model.apply(
        variables, mix, enroll, train=True, mutable=["batch_stats"]
    )[0]
    assert logits is None
    s, self_s, lab, self_lab = outs
    assert s.shape == (2, 4000) and self_s.shape == (2, 4000)
    assert lab.shape == (2, 7) and self_lab.shape == (2, 7)
    # the two passes share separator params but differ in enrollment
    assert not np.allclose(np.asarray(s), np.asarray(self_s))

    # eval mode: single pass, (est, logits) contract (values differ from the
    # train pass because the speaker encoder's BatchNorm switches to
    # running stats)
    est, lab_eval = model.apply(variables, mix, enroll, train=False)
    assert est.shape == (2, 4000)
    assert lab_eval.shape == (2, 7)

    # multi-optim loss table (confs/bsrnn_multi_optim.yaml)
    total = weighted_loss(
        (outs, None),
        mix * 0.5,
        jnp.asarray([1, 2]),
        [si_sdr_loss, ce_loss],
        loss_posi=[[0, 1], [2, 3]],
        loss_weight=[[0.36, 0.54], [0.04, 0.06]],
        multi_task=True,
    )
    assert np.isfinite(float(total))


def test_ssa_gradients_flow_through_both_passes():
    from wesep_tpu.train.losses import si_sdr_loss

    model = _model()
    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(
        rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), mix, enroll, train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            mix, enroll, train=True, mutable=["batch_stats"],
        )[0]
        s, self_s = outs[0], outs[1]
        return 0.4 * jnp.mean(si_sdr_loss(s, mix * 0.5)) + 0.6 * jnp.mean(
            si_sdr_loss(self_s, mix * 0.5)
        )

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


# ---- golden weight-port parity vs the reference torch model -----------------
#
# /root/reference/wesep/models/bsrnn_multi_optim.py:156-474. The parameter
# tree is structurally identical to BSRNN (BN/separator/mask/spk_transform),
# so the port reuses test_bsrnn's mapping; what BSRNN_Multi adds is the SSA
# second pass (enrollment := own detached estimate through the speaker
# encoder), exercised in grad mode below.


def _ref_multi(**kwargs):
    from ref_compat import install_reference

    install_reference()
    from wesep.models.bsrnn_multi_optim import BSRNN_Multi as RefMulti

    return RefMulti(**kwargs)


def test_bsrnn_multi_eval_matches_reference():
    """Eval path (single pass, pre-extracted embeddings): waveform parity
    at the flagship bar (atol 5e-4)."""
    torch = pytest.importorskip("torch")
    from test_bsrnn import _port_bsrnn

    from wesep_tpu.models import get_model
    from wesep_tpu.models.bsrnn import band_layout

    torch.manual_seed(0)
    kwargs = dict(
        spk_emb_dim=256,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=16,
        num_repeat=2,
        use_spk_transform=True,
        spk_fuse_type="concat",
        multi_fuse=True,
        joint_training=False,
    )
    ref = _ref_multi(**{**kwargs, "spksInTrain": 17}).eval()
    model = get_model("BSRNN_Multi")(**kwargs, remat=False)

    groups = band_layout(16000, 512 // 2 + 1)
    params = _port_bsrnn(ref, groups, 2, multi_fuse=True)

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((2, 256)).astype(np.float32)

    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    est, logits = model.apply(
        {"params": params}, jnp.asarray(mix), jnp.asarray(emb), train=False
    )
    assert logits is None
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )


def test_bsrnn_multi_ssa_two_pass_matches_reference():
    """SSA grad-mode parity: BOTH outputs (s from the enrollment pass,
    self_s from the self-estimate pass through the consistent melspec ->
    ECAPA branch) match the reference torch model with ported weights.

    The reference keys the second pass on torch.is_grad_enabled()
    (bsrnn_multi_optim.py:407); BN layers run in train mode on both sides
    (batch statistics) so the speaker branch is numerically comparable.
    """
    torch = pytest.importorskip("torch")
    import ref_compat
    from test_bsrnn import _port_bsrnn
    from test_ecapa_ws import _randomize_bn_stats, _TorchEcapaWS

    from wesep_tpu.models import get_model
    from wesep_tpu.models.bsrnn import band_layout
    from wesep_tpu.utils.torch_port import port_wespeaker_ecapa_state_dict

    ref_compat.install_reference()
    ref_compat.register_speaker_model(
        "ECAPA_TDNN_GLOB_c32",
        lambda feat_dim, embed_dim, **_kw: _TorchEcapaWS(
            channels=32, feat_dim=feat_dim, embed_dim=embed_dim,
            global_context_att=True,
        ),
    )

    torch.manual_seed(1)
    spk_args = {"feat_dim": 40, "embed_dim": 16}
    kwargs = dict(
        spk_emb_dim=16,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=16,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=True,
        multi_task=False,
        spk_model="ECAPA_TDNN_GLOB_c32",
        spk_feat=False,
        feat_type="consistent",
    )
    ref = _ref_multi(**{**kwargs, "spk_args": spk_args, "spksInTrain": 17})
    gen = torch.Generator().manual_seed(2)
    _randomize_bn_stats(ref.spk_model, gen)
    ref.train()  # BN on batch stats; SSA keys on grad mode, not train()

    model = get_model("BSRNN_Multi")(
        **kwargs,
        spk_args={**spk_args, "layout": "wespeaker"},
        remat=False,
    )
    groups = band_layout(16000, 512 // 2 + 1)
    params = _port_bsrnn(ref, groups, 1, multi_fuse=False)
    spk_sd = {
        k: v.detach().numpy() for k, v in ref.spk_model.state_dict().items()
    }
    spk_params, spk_stats = port_wespeaker_ecapa_state_dict(spk_sd)
    params["spk_model_net"] = jax.tree_util.tree_map(
        jnp.asarray, spk_params
    )
    variables = {
        "params": params,
        "batch_stats": {
            "spk_model_net": jax.tree_util.tree_map(jnp.asarray, spk_stats)
        },
    }

    rng = np.random.default_rng(3)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1

    with torch.enable_grad():
        ref_s, ref_self_s, _, _ = ref(
            torch.from_numpy(mix), torch.from_numpy(enroll)
        )
    (outs, logits), _ = model.apply(
        variables,
        jnp.asarray(mix),
        jnp.asarray(enroll),
        train=True,
        mutable=["batch_stats"],
    )
    s, self_s = outs[0], outs[1]
    np.testing.assert_allclose(
        np.asarray(s), ref_s.detach().numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(self_s), ref_self_s.detach().numpy(), atol=1e-3,
        rtol=1e-3,
    )
