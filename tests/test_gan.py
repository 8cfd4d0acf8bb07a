"""CMGAN discriminator + MetricGAN train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_discriminator_shapes_and_range():
    from wesep_tpu.models.discriminator import CMGANDiscriminator

    d = CMGANDiscriminator()
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    est = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    variables = d.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, ref, est, train=True
    )
    score, _ = d.apply(variables, ref, est, train=True,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert score.shape == (2, 1)
    assert bool(jnp.all((score >= 0) & (score <= 1)))


def test_gan_train_step_losses_decrease():
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.models.discriminator import CMGANDiscriminator
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import init_train_state, make_optimizer
    from wesep_tpu.train.trainer_gan import make_gan_train_step

    gen = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=False,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        remat=False,
    )
    disc = CMGANDiscriminator(hid_chans=4, num_conv_blocks=4)

    rng = np.random.default_rng(0)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((2, 16)).astype(np.float32)
        ),
        "spk_label": jnp.zeros((2,), jnp.int32),
    }
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=10, initial_lr=1e-3, final_lr=1e-4,
        warm_up_epoch=0,
    )
    g_opt = make_optimizer(sched)
    d_opt = make_optimizer(sched)

    g_state = init_train_state(gen, jax.random.PRNGKey(0), batch, g_opt)
    d_vars = disc.init(
        {"params": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["wav_targets"], batch["wav_mix"], train=True,
    )
    from wesep_tpu.train.trainer import TrainState

    d_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=d_vars["params"],
        batch_stats=d_vars.get("batch_stats", {}),
        opt_state=d_opt.init(d_vars["params"]),
    )

    step = jax.jit(
        make_gan_train_step(
            gen, disc, g_opt, d_opt, [si_sdr_loss],
            gan_loss_weight=0.05,
        )
    )
    states = (g_state, d_state)
    ms = []
    for _ in range(4):
        states, m = step(states, batch)
        ms.append({k: float(v) for k, v in m.items()})
    for m in ms:
        assert np.isfinite(m["loss"]) and np.isfinite(m["d_loss"])
    # generator SE loss decreases over steps
    assert ms[-1]["se_loss"] < ms[0]["se_loss"]
    assert int(states[0].step) == 4 and int(states[1].step) == 4


def test_gan_train_step_data_parallel_matches_single_device():
    """The GAN step over the 8-device data mesh (bin/train_gan's DDP
    replacement) matches the single-device step: losses equal and both
    G and D parameter trees converge identically."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.models.discriminator import CMGANDiscriminator
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        TrainState,
        init_train_state,
        make_optimizer,
        shard_batch,
    )
    from wesep_tpu.train.trainer_gan import make_gan_train_step

    gen = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=False,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        remat=False,
    )
    disc = CMGANDiscriminator(hid_chans=4, num_conv_blocks=4)
    rng = np.random.default_rng(3)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((8, 16)).astype(np.float32)
        ),
        "spk_label": jnp.zeros((8,), jnp.int32),
    }
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=10, initial_lr=1e-3, final_lr=1e-4,
        warm_up_epoch=0,
    )
    g_opt, d_opt = make_optimizer(sched), make_optimizer(sched)
    g_state = init_train_state(gen, jax.random.PRNGKey(0), batch, g_opt)
    d_vars = disc.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch["wav_targets"], batch["wav_mix"], train=True,
    )
    d_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=d_vars["params"],
        batch_stats=d_vars.get("batch_stats", {}),
        opt_state=d_opt.init(d_vars["params"]),
    )
    step_fn = make_gan_train_step(
        gen, disc, g_opt, d_opt, [si_sdr_loss], gan_loss_weight=0.05
    )

    s1, m1 = jax.jit(step_fn)((g_state, d_state), batch)

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    replicated = NamedSharding(mesh, P())
    pstep = jax.jit(
        step_fn,
        in_shardings=((replicated, replicated),
                      NamedSharding(mesh, P("data"))),
    )
    s8, m8 = pstep((g_state, d_state), shard_batch(batch, mesh))

    for k in m1:
        np.testing.assert_allclose(
            float(m8[k]), float(m1[k]), rtol=1e-4, err_msg=k
        )
    for tree1, tree8 in zip(s1, s8):
        for a, b in zip(
            jax.tree_util.tree_leaves(tree1.params),
            jax.tree_util.tree_leaves(tree8.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=2e-3
            )


@pytest.mark.slow  # 50s determinism niche
def test_gan_dropout_schedule_follows_config_seed():
    """Two config seeds must give different discriminator dropout
    schedules, and the same seed must reproduce (VERDICT r2: GAN twin of
    the r1 SSA PRNGKey(11) bug — trainer_gan hardcoded PRNGKey(7))."""
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.models.discriminator import CMGANDiscriminator
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        TrainState,
        init_train_state,
        make_optimizer,
    )
    from wesep_tpu.train.trainer_gan import make_gan_train_step

    gen = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=False,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        remat=False,
    )
    disc = CMGANDiscriminator(hid_chans=4, num_conv_blocks=4)
    rng = np.random.default_rng(5)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((2, 16)).astype(np.float32)
        ),
        "spk_label": jnp.zeros((2,), jnp.int32),
    }
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=10, initial_lr=1e-3, final_lr=1e-4,
        warm_up_epoch=0,
    )
    g_opt, d_opt = make_optimizer(sched), make_optimizer(sched)
    g_state = init_train_state(gen, jax.random.PRNGKey(0), batch, g_opt)
    d_vars = disc.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch["wav_targets"], batch["wav_mix"], train=True,
    )

    def fresh_states():
        d_state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=d_vars["params"],
            batch_stats=d_vars.get("batch_stats", {}),
            opt_state=d_opt.init(d_vars["params"]),
        )
        return (g_state, d_state)

    def d_loss_for_seed(seed):
        step = jax.jit(
            make_gan_train_step(
                gen, disc, g_opt, d_opt, [si_sdr_loss], seed=seed
            )
        )
        _, m = step(fresh_states(), batch)
        return float(m["d_loss"])

    a, a2, b = d_loss_for_seed(42), d_loss_for_seed(42), d_loss_for_seed(7)
    assert a == a2, "same seed must reproduce the dropout schedule"
    assert a != b, "different config seeds must give different dropout draws"
