"""BSRNN_Multi (SSA) two-pass training contract."""

import numpy as np

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

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(bool(jnp.any(l != 0)) for l in leaves)
