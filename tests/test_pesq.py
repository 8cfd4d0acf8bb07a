"""Native jittable P.862 (PESQ) model: anchors, monotonicity, GAN use.

The reference computes real PESQ per batch on the host via the `pesq` C
extension inside the MetricGAN executor
(/root/reference/wesep/utils/executor_gan.py:309-337); the rebuild scores
whole batches on device (wesep_tpu/ops/pesq.py). No ITU binary exists in
this environment, so these tests pin the spec'd anchors (clean == 4.64 wb
/ 4.55 nb), P.862 invariants (level alignment => gain invariance), and
strict monotonicity in degradation strength.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wesep_tpu.ops.pesq import pesq_batch, pesq_norm_batch

FS = 16000


def _speech_like(t=FS * 3, seed=0):
    """Band-limited modulated noise: energy envelope like speech."""
    from scipy import signal as sp

    rng = np.random.default_rng(seed)
    x = rng.standard_normal(t).astype(np.float32)
    b, a = sp.butter(4, [100, 4000], btype="band", fs=FS)
    x = sp.lfilter(b, a, x).astype(np.float32)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * 4 * np.arange(t) / FS))
    x = x * env.astype(np.float32)
    return x / np.abs(x).max()


def _with_noise(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x)).astype(np.float32)
    n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + n


def test_clean_anchor_wb():
    x = _speech_like()
    score = float(pesq_batch(x[None], x[None])[0])
    assert abs(score - 4.64) < 0.02


def test_clean_anchor_nb():
    x = _speech_like()[::2]
    score = float(pesq_batch(x[None], x[None], fs=8000)[0])
    assert abs(score - 4.55) < 0.02


def test_monotonic_in_snr():
    x = _speech_like()
    scores = [
        float(pesq_batch(x[None], _with_noise(x, snr)[None])[0])
        for snr in (40, 30, 20, 10, 0)
    ]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.0  # 40 dB SNR barely audible
    assert scores[-1] < 1.6  # 0 dB white noise is bad


def test_gain_invariance():
    """P.862 level-aligns both signals: pure gain must not change score."""
    x = _speech_like()
    y = _with_noise(x, 20)
    s1 = float(pesq_batch(x[None], y[None])[0])
    s2 = float(pesq_batch(x[None], (0.25 * y)[None])[0])
    s3 = float(pesq_batch((2.0 * x)[None], y[None])[0])
    np.testing.assert_allclose(s1, s2, atol=1e-3)
    np.testing.assert_allclose(s1, s3, atol=1e-3)


def test_clipping_penalized():
    x = _speech_like()
    clipped = np.clip(x, -0.3, 0.3)
    assert float(pesq_batch(x[None], clipped[None])[0]) < 3.5


def test_batch_matches_single():
    x1, x2 = _speech_like(seed=0), _speech_like(seed=3)
    y1, y2 = _with_noise(x1, 15), _with_noise(x2, 25)
    batch = pesq_batch(np.stack([x1, x2]), np.stack([y1, y2]))
    s1 = pesq_batch(x1[None], y1[None])[0]
    s2 = pesq_batch(x2[None], y2[None])[0]
    np.testing.assert_allclose(np.asarray(batch), [s1, s2], rtol=1e-5)


def test_jit_and_grad():
    """The model must stay compiled inside a train step (and be
    differentiable so it can even serve as a loss)."""
    x = _speech_like(t=FS)
    y = _with_noise(x, 15)

    @jax.jit
    def f(ref, deg):
        return jnp.sum(pesq_batch(ref, deg))

    s = f(x[None], y[None])
    assert np.isfinite(float(s))
    g = jax.grad(lambda d: jnp.sum(pesq_batch(x[None], d)))(y[None])
    assert np.isfinite(np.asarray(g)).all()


def test_norm_and_valid_mask():
    x = _speech_like(t=FS)
    y = _with_noise(x, 20)
    sil = np.zeros_like(x)
    vals, valid = pesq_norm_batch(
        np.stack([y, sil]), np.stack([x, x])
    )
    vals, valid = np.asarray(vals), np.asarray(valid)
    assert 0.0 < vals[0] < 1.0
    assert valid[0] and not valid[1]
    # normalization matches the reference formula (score.py:52-55)
    raw = float(pesq_batch(x[None], y[None])[0])
    np.testing.assert_allclose(vals[0], (raw + 0.5) / 5.0, rtol=1e-5)


def test_cal_pesq_fallback_and_alignment():
    """utils.score.cal_PESQ uses the native model when `pesq` is absent,
    with crude alignment recovering a shifted estimate."""
    from wesep_tpu.utils.score import cal_PESQ, cal_PESQ_norm

    x = _speech_like()
    y = _with_noise(x, 25)
    p = cal_PESQ(y, x)
    assert p is not None and 2.0 < p < 4.64
    assert cal_PESQ(np.zeros_like(x), x) is None
    n = cal_PESQ_norm(y, x)
    np.testing.assert_allclose(n, (p + 0.5) / 5.0, rtol=1e-5)

    shift = 800
    y_shift = np.concatenate([np.zeros(shift, np.float32), y[:-shift]])
    p_shift = cal_PESQ(y_shift, x)
    assert p_shift is not None and abs(p_shift - p) < 0.35


def test_gan_step_with_real_pesq():
    """A few MetricGAN steps with on-device PESQ targets: losses finite,
    D learns (d_loss falls), everything stays compiled."""
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.models.discriminator import CMGANDiscriminator
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        TrainState,
        init_train_state,
        make_optimizer,
    )
    from wesep_tpu.train.trainer_gan import make_gan_train_step, metric_pesq

    t = 4000
    model = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=False,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        remat=False,
    )
    disc = CMGANDiscriminator(hid_chans=4, num_conv_blocks=4)
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=4, initial_lr=1e-4, final_lr=1e-5,
        warm_up_epoch=0,
    )
    g_opt = make_optimizer(sched, weight_decay=0.0, clip_grad=5.0)
    d_opt = make_optimizer(sched, weight_decay=0.0, clip_grad=5.0)

    rng = np.random.default_rng(0)
    targets = np.stack([_speech_like(t, seed=i) for i in range(2)])
    mix = targets + 0.3 * rng.standard_normal((2, t)).astype(np.float32)
    batch = {
        "wav_mix": jnp.asarray(mix),
        "wav_targets": jnp.asarray(targets),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((2, 16)).astype(np.float32)
        ),
    }
    gen_state = init_train_state(model, jax.random.PRNGKey(0), batch, g_opt)
    d_vars = disc.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch["wav_targets"], batch["wav_mix"], train=True,
    )
    dis_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=d_vars["params"],
        batch_stats=d_vars.get("batch_stats", {}),
        opt_state=d_opt.init(d_vars["params"]),
    )
    step = jax.jit(make_gan_train_step(
        model, disc, g_opt, d_opt, [si_sdr_loss],
        metric_fn=metric_pesq,
    ))
    states = (gen_state, dis_state)
    d_losses = []
    for _ in range(6):
        states, metrics = step(states, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
        d_losses.append(float(metrics["d_loss"]))
    # D learns: compare 2-step averages so a single dropout draw can't
    # flip the verdict (the per-step d_loss is noisy by design).
    assert (d_losses[-2] + d_losses[-1]) / 2 < (d_losses[0] + d_losses[1]) / 2
