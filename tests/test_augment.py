"""On-device batched augmentation: FRAM-RIR, mixing, noise (jit-safe)."""

import numpy as np

import jax
import jax.numpy as jnp

from wesep_tpu.data.augment import (
    RirConfig,
    add_noise_snr,
    augment_batch,
    fft_convolve,
    reverberate,
    sample_rirs,
    snr_mix,
)


def test_sample_rirs_jit_and_decay():
    cfg = RirConfig(num_src=2, n_image=(256, 512))
    rirs, early = jax.jit(
        lambda k: sample_rirs(k, 4, cfg), static_argnums=()
    )(jax.random.PRNGKey(0))
    out_len = int(np.ceil(16000 * 0.7))
    assert rirs.shape == (4, 2, out_len)
    assert early.shape == rirs.shape
    assert bool(jnp.all(jnp.isfinite(rirs)))
    e = np.asarray(rirs[0, 0] ** 2)
    assert e[: out_len // 4].sum() > 5 * e[-out_len // 10 :].sum()
    # early is energy-subset
    assert float(jnp.sum(early**2)) <= float(jnp.sum(rirs**2)) + 1e-6
    # different keys -> different rooms
    r2, _ = sample_rirs(jax.random.PRNGKey(1), 4, cfg)
    assert not np.allclose(np.asarray(rirs), np.asarray(r2))


def test_fft_convolve_matches_scipy():
    from scipy import signal as sp

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 3, 4000)).astype(np.float32)
    rir = rng.standard_normal((2, 3, 300)).astype(np.float32) * 0.1
    got = np.asarray(fft_convolve(jnp.asarray(wav), jnp.asarray(rir)))
    for b in range(2):
        for s in range(3):
            want = sp.convolve(wav[b, s], rir[b, s], mode="full")[:4000]
            np.testing.assert_allclose(got[b, s], want, atol=2e-3)


def test_snr_mix_parity_with_host_processor():
    """Device snr_mix == host snr_mixer at 0 dB."""
    from wesep_tpu.data.processor import snr_mixer

    rng = np.random.default_rng(1)
    s1 = rng.standard_normal((1, 4000)).astype(np.float32) * 0.3
    s2 = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    sample = {
        "key": "k", "num_speaker": 2, "sample_rate": 16000,
        "wav_spk1": s1.copy(), "wav_spk2": s2.copy(),
    }
    host = next(iter(snr_mixer(iter([sample]), use_random_snr=False)))
    mix, scaled = snr_mix(
        jax.random.PRNGKey(0),
        jnp.asarray(np.stack([s1[0], s2[0]])[None]),
        use_random_snr=False,
    )
    np.testing.assert_allclose(
        np.asarray(mix[0]), host["wav_mix"][0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scaled[0, 0]), host["wav_spk1"][0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scaled[0, 1]), host["wav_spk2"][0], atol=1e-5
    )


def test_add_noise_snr_realized():
    rng = np.random.default_rng(2)
    mix = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    noisy = add_noise_snr(
        jax.random.PRNGKey(0), mix, noise, snr_lo=10.0, snr_hi=10.0,
        prob=1.0,
    )
    added = np.asarray(noisy - mix)
    snr = 10 * np.log10(
        np.mean(np.asarray(mix) ** 2, -1) / np.mean(added**2, -1)
    )
    np.testing.assert_allclose(snr, 10.0, atol=0.2)


def test_augment_batch_jit_end_to_end():
    rng = np.random.default_rng(3)
    srcs = jnp.asarray(
        rng.standard_normal((2, 2, 8000)).astype(np.float32) * 0.2
    )
    noise = jnp.asarray(
        rng.standard_normal((2, 8000)).astype(np.float32) * 0.2
    )
    cfg = RirConfig(num_src=2, n_image=(128, 256))

    @jax.jit
    def run(key):
        return augment_batch(
            key, srcs, noise, cfg, reverb_prob=1.0, use_random_snr=True,
            noise_prob=1.0,
        )

    mix, targets = run(jax.random.PRNGKey(0))
    assert mix.shape == (2, 8000) and targets.shape == (2, 2, 8000)
    assert bool(jnp.all(jnp.isfinite(mix)))
    # mixture contains noise beyond the sum of targets
    resid = np.asarray(mix - targets.sum(axis=1))
    assert np.abs(resid).max() > 1e-4
    # reverb actually applied: targets differ from a no-reverb run
    mix2, targets2 = jax.jit(
        lambda k: augment_batch(k, srcs, noise, cfg, reverb_prob=0.0,
                                use_random_snr=True, noise_prob=0.0)
    )(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(targets), np.asarray(targets2))
