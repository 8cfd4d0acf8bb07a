"""Speaker-encoder zoo: shapes, jit, and the joint BSRNN training path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.models.speaker import get_speaker_model


def _feats(b=2, t=150, f=80, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))


@pytest.mark.parametrize(
    "name,kwargs,embed",
    [
        ("ResNet34", {"feat_dim": 80, "embed_dim": 256,
                      "pooling_func": "TSTP", "two_emb_layer": False}, 256),
        ("ResNet18", {"embed_dim": 128, "two_emb_layer": True}, 128),
        ("ECAPA_TDNN_GLOB_c512", {"embed_dim": 192,
                                  "pooling_func": "ASTP"}, 192),
        # reduced stage plan: same structure (multi-layer dense blocks,
        # all three dilations, transits) at 8 instead of 52 layers —
        # the full-width topology is pinned by tests/test_campplus_ws.py
        ("CAMPPlus", {"embed_dim": 192,
                      "stages": ((3, 1), (3, 2), (2, 2))}, 192),
    ],
)
def test_speaker_model_shapes(name, kwargs, embed):
    ctor = get_speaker_model(name)
    kwargs = dict(kwargs)
    kwargs.pop("feat_dim", None)
    model = ctor(**kwargs)
    x = _feats()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    if isinstance(out, tuple):
        out = out[-1]
    assert out.shape == (2, embed)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_resnet34_batch_stats_update():
    model = get_speaker_model("ResNet34")(embed_dim=64, two_emb_layer=False)
    x = _feats()
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    out, updated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_pooling_layers():
    from wesep_tpu.models.speaker.pooling import ASTP, MQMHASTP, TSTP

    x = _feats(f=64)
    for mod in (TSTP(), ASTP(global_context=True), ASTP(global_context=False),
                MQMHASTP()):
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        out = mod.apply(v, x, train=False)
        assert out.shape == (2, 128)
        if isinstance(mod, MQMHASTP):
            continue  # per-head concat layout; shape check only
        # constant-over-time input => std ~ 0, mean = value
        const = jnp.broadcast_to(x[:, :1, :], x.shape)
        out_c = mod.apply(v, const, train=False)
        np.testing.assert_allclose(
            np.asarray(out_c[:, :64]), np.asarray(x[:, 0, :]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_c[:, 64:]), 0.0, atol=2e-3
        )


def test_joint_bsrnn_trains_with_resnet():
    """BSRNN joint path: raw enrollment wav -> ResNet34 -> fuse; one train
    step with batch_stats mutation and CE multi-task head."""
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.losses import ce_loss, si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model = BSRNN(
        spk_emb_dim=64,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=True,
        multi_task=True,
        spksInTrain=11,
        spk_model="ResNet34",
        spk_args={"feat_dim": 80, "embed_dim": 64, "pooling_func": "TSTP",
                  "two_emb_layer": False},
        spk_feat=False,
        feat_type="consistent",
    )
    rng = np.random.default_rng(0)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "spk_label": jnp.asarray([3, 7]),
    }
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=10, initial_lr=1e-3, final_lr=1e-4,
        warm_up_epoch=0,
    )
    optimizer = make_optimizer(sched)
    step = make_train_step(
        model,
        optimizer,
        [si_sdr_loss, ce_loss],
        loss_posi=[[0], [1]],
        loss_weight=[[1.0], [0.5]],
        multi_task=True,
    )
    state = init_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
    assert state.batch_stats  # ResNet BN stats present
    state, m1 = jax.jit(step)(state, batch)
    state, m2 = jax.jit(step)(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
