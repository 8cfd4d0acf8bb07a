"""Batched, jittable on-device augmentation: FRAM-RIR + SNR mix + noise.

The reference runs per-sample python FRAM-RIR/mixing inside DataLoader
workers — the data-pipeline bottleneck (SURVEY §3.4). Here the whole
simulation chain is jax: one jitted call augments a full batch on the TPU,
so host CPUs only decode/chunk audio. This is new TPU-first architecture,
not a port; the math follows FRAM-RIR (arXiv:2304.08052,
/root/reference/wesep/dataset/FRAM_RIR.py:126-355) with two
compiler-friendly changes:

  * static shapes: a fixed image budget (`n_image_max`) with a random
    VALID mask replaces the random image count; a fixed RIR length at the
    max RT60 replaces the T60-dependent length (beyond-T60 taps are
    scattered into a trash slot);
  * the 64x oversampled delta grid + resample/highpass chain becomes a
    linear-interp fractional-delay scatter at 8x plus one static
    decimate+highpass FIR (same passband, 8x less memory).

All functions take an explicit PRNG key and are vmap/jit-safe.
"""

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RirConfig",
    "sample_rirs",
    "fft_convolve",
    "snr_mix",
    "add_noise_snr",
    "augment_batch",
]

_VELOCITY = 340.0


class RirConfig(NamedTuple):
    sr: int = 16000
    num_src: int = 2
    rt60: Tuple[float, float] = (0.1, 0.7)
    room_lo: Tuple[float, float, float] = (3.0, 3.0, 2.5)
    room_hi: Tuple[float, float, float] = (10.0, 6.0, 4.0)
    mic_dist: Tuple[float, float] = (0.2, 5.0)
    n_image: Tuple[int, int] = (1024, 4096)
    a: float = -2.0
    b: float = 2.0
    tau: float = 0.25
    oversample: int = 8
    min_dis_wall: float = 0.5


@functools.lru_cache(maxsize=8)
def _decim_fir(oversample: int, sr: int) -> np.ndarray:
    """Static FIR: anti-alias lowpass for the 8x decimation combined with
    an 80 Hz highpass (the reference's resample+highpass_biquad chain)."""
    from scipy import signal as sp

    numtaps = 16 * oversample + 1
    hi_sr = sr * oversample
    # lowpass at Nyquist of the target rate
    lp = sp.firwin(numtaps, 0.9 * (sr / 2), fs=hi_sr)
    # highpass at 80 Hz (long enough for the transition)
    hp = sp.firwin(numtaps, 80.0, fs=hi_sr, pass_zero=False)
    fir = np.convolve(lp, hp)
    return fir.astype(np.float32)


def sample_rirs(key: jax.Array, batch: int, cfg: RirConfig):
    """-> (rir [B, n_src, L], early [B, n_src, L]) at cfg.sr, jittable.

    L = ceil(sr * rt60_max). Single-channel (the recipes' configuration,
    FRAM_RIR.py:514-522).
    """
    os_rate = cfg.sr * cfg.oversample
    rt60_max = cfg.rt60[1]
    hi_len = int(np.ceil(os_rate * rt60_max))
    out_len = int(np.ceil(cfg.sr * rt60_max))
    n_img = cfg.n_image[1]
    ns = cfg.num_src

    keys = jax.random.split(key, 12)
    room = jax.random.uniform(
        keys[0], (batch, 3),
        minval=jnp.asarray(cfg.room_lo), maxval=jnp.asarray(cfg.room_hi),
    )
    rt60 = jax.random.uniform(
        keys[1], (batch, 1, 1), minval=cfg.rt60[0], maxval=cfg.rt60[1]
    )
    wall = cfg.min_dis_wall
    mic_pos = jax.random.uniform(keys[2], (batch, 3)) * (
        room - 2 * wall
    ) + wall

    # source positions: uniform in the room interior, then radially
    # clamped into [mic_dist_lo, mic_dist_hi] of the mic (replaces the
    # reference's rejection loop with a jit-safe projection)
    src = jax.random.uniform(keys[3], (batch, ns, 3)) * (
        room[:, None] - 2 * wall
    ) + wall
    delta = src - mic_pos[:, None]
    dist = jnp.sqrt(jnp.sum(delta**2, -1, keepdims=True) + 1e-6)
    clamped = jnp.clip(dist, cfg.mic_dist[0], cfg.mic_dist[1])
    src = mic_pos[:, None] + delta / dist * clamped
    src = jnp.clip(src, wall, room[:, None] - wall)

    # [B, ns]
    direct_dist = jnp.sqrt(
        jnp.sum((src - mic_pos[:, None]) ** 2, -1) + 1e-3
    )

    R = 1.0 / (
        2.0 * (1.0 / room[:, 0] + 1.0 / room[:, 1] + 1.0 / room[:, 2])
    )
    reflect_coef = jnp.sqrt(
        1.0 - (1.0 - jnp.exp(-0.16 * R[:, None, None] / rt60)) ** 2
    )  # [B,1,1]

    # image-count mask (replaces np.random.choice of the count)
    count = jax.random.randint(
        keys[4], (batch, 1, 1), cfg.n_image[0], cfg.n_image[1] + 1
    )
    valid = (
        jnp.arange(n_img)[None, None, :] < count
    )  # [B, 1, n_img]

    # distance ratios sampled from the linear pdf via inverse-CDF:
    # p(u) ∝ u  =>  u = sqrt(uniform)
    u = jnp.sqrt(jax.random.uniform(keys[5], (batch, ns, n_img)))
    max_ratio = _VELOCITY * rt60 / direct_dist[..., None] - 1.0
    dist_nearest_ratio = 1.0 + u * jnp.maximum(max_ratio - 1.0, 0.0)

    azm = jax.random.uniform(
        keys[6], (batch, ns, n_img), minval=-np.pi, maxval=np.pi
    )
    ele = jax.random.uniform(
        keys[7], (batch, ns, n_img), minval=-np.pi / 2, maxval=np.pi / 2
    )
    img_dist_vec = direct_dist[..., None] * dist_nearest_ratio
    # image-to-mic distance directly (single mic: nearest mic == the mic)
    dist_img = jnp.sqrt(img_dist_vec**2 + 1e-3)
    del azm, ele  # angles do not affect single-mic distances

    reflect_max = (
        jnp.log10(_VELOCITY * rt60) - 3.0
    ) / jnp.log10(reflect_coef)
    reflect_ratio = (dist_img / (_VELOCITY * rt60)) * (
        reflect_max - 1.0
    ) + 1.0
    pert = jax.random.uniform(
        keys[8], (batch, ns, n_img), minval=cfg.a, maxval=cfg.b
    ) * dist_nearest_ratio**cfg.tau
    reflect_ratio = jnp.maximum(reflect_ratio + pert, 1.0)

    # direct path prepended
    dist_all = jnp.concatenate(
        [direct_dist[..., None], dist_img], axis=-1
    )  # [B, ns, 1+n_img]
    reflect_all = jnp.concatenate(
        [jnp.zeros((batch, ns, 1)), reflect_ratio], axis=-1
    )
    valid_all = jnp.concatenate(
        [jnp.ones((batch, ns, 1), bool), valid & jnp.ones(
            (batch, ns, n_img), bool)], axis=-1,
    )

    decay = reflect_coef**reflect_all / dist_all
    decay = jnp.where(valid_all, decay, 0.0)

    # fractional-delay scatter at the oversampled rate (linear interp)
    delay = dist_all * (os_rate / _VELOCITY)
    idx0 = jnp.floor(delay).astype(jnp.int32)
    frac = delay - idx0
    # taps beyond this sample's rir length go to a trash slot
    hi_len_b = jnp.ceil(os_rate * rt60).astype(jnp.int32)  # [B,1,1]
    oob = idx0 >= jnp.minimum(hi_len_b, hi_len - 1)
    idx0 = jnp.where(oob, hi_len, idx0)

    flat_b = jnp.arange(batch)[:, None, None]
    flat_s = jnp.arange(ns)[None, :, None]
    rir_hi = jnp.zeros((batch, ns, hi_len + 2), jnp.float32)
    rir_hi = rir_hi.at[flat_b, flat_s, idx0].add(decay * (1.0 - frac))
    rir_hi = rir_hi.at[flat_b, flat_s, idx0 + 1].add(decay * frac)
    rir_hi = rir_hi[..., :hi_len]

    # early (direct-range) mask: [-6, +50] ms around the direct tap
    direct_idx = jnp.ceil(
        direct_dist * (os_rate / _VELOCITY)
    )[..., None]  # [B, ns, 1]
    lo = jnp.maximum(direct_idx + os_rate * (-6) // 1000, 0)
    hi = direct_idx + os_rate * 50 // 1000
    pos = jnp.arange(hi_len)[None, None, :]
    direct_mask = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
    early_hi = rir_hi * direct_mask

    # decimate+highpass with the static FIR, polyphase via strided conv
    fir = jnp.asarray(_decim_fir(cfg.oversample, cfg.sr))

    def decimate(x):
        flat = x.reshape(batch * ns, 1, -1)
        pad = fir.shape[0] // 2
        y = jax.lax.conv_general_dilated(
            flat,
            fir[None, None, :],
            window_strides=(cfg.oversample,),
            padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return y.reshape(batch, ns, -1)[..., :out_len]

    return decimate(rir_hi), decimate(early_hi)


def fft_convolve(wav: jnp.ndarray, rir: jnp.ndarray) -> jnp.ndarray:
    """Batched FFT convolution, trimmed to the wav length.

    wav [..., T], rir [..., L] -> [..., T] (mode='full' then [:T], the
    reference add_reverb semantics, processor.py:771-774).
    """
    t = wav.shape[-1]
    l = rir.shape[-1]
    n = int(2 ** np.ceil(np.log2(t + l - 1)))
    W = jnp.fft.rfft(wav, n=n)
    R = jnp.fft.rfft(rir, n=n)
    y = jnp.fft.irfft(W * R, n=n)
    return y[..., :t].astype(wav.dtype)


def reverberate(key, wavs, rirs, prob: float = 1.0):
    """Per-source reverb with probability `prob`, peak-normalized to 0.9
    (processor.py:758-780). wavs/rirs: [B, S, T] / [B, S, L]."""
    rev = fft_convolve(wavs, rirs)
    peak = jnp.max(jnp.abs(rev), axis=-1, keepdims=True)
    rev = rev / jnp.maximum(peak, 1e-10) * 0.9
    coin = jax.random.uniform(key, wavs.shape[:2] + (1,)) < prob
    return jnp.where(coin, rev, wavs)


def snr_mix(key, srcs: jnp.ndarray, use_random_snr: bool = True):
    """Energy-scaled sum at random SNR in [-10, 10] dB + joint peak renorm
    (snr_mixer, processor.py:277-320). srcs [B, S, T] ->
    (mix [B, T], scaled_srcs [B, S, T])."""
    b, s, t = srcs.shape
    target_e = jnp.sum(srcs[:, :1] ** 2, -1, keepdims=True)  # [B,1,1]
    if use_random_snr:
        snr = jax.random.uniform(key, (b, s, 1), minval=-10.0, maxval=10.0)
    else:
        snr = jnp.zeros((b, s, 1))
    snr = snr.at[:, 0].set(0.0)  # target unscaled
    energy = jnp.sum(srcs**2, -1, keepdims=True)
    scale = jnp.sqrt(target_e / jnp.maximum(energy, 1e-10)) * 10 ** (
        snr / 20.0
    )
    scale = scale.at[:, 0].set(1.0)
    scaled = srcs * scale
    mix = jnp.sum(scaled, axis=1)
    max_amp = jnp.maximum(
        jnp.max(jnp.abs(mix), -1, keepdims=True),
        jnp.max(jnp.abs(scaled), axis=(1, 2))[:, None],
    )
    norm = 1.0 / jnp.maximum(max_amp, 1e-10)
    return mix * norm, scaled * norm[:, None]


def add_noise_snr(
    key,
    mix: jnp.ndarray,
    noise: jnp.ndarray,
    snr_lo: float = -5.0,
    snr_hi: float = 25.0,
    prob: float = 1.0,
    speech_noise: Optional[jnp.ndarray] = None,
):
    """Additive noise at a random SNR (add_noise, processor.py:650-743).

    mix/noise: [B, T]; speech_noise: optional bool [B] selecting the
    [10, 30] dB range used for speech-type noise.
    """
    b = mix.shape[0]
    k1, k2 = jax.random.split(key)
    snr = jax.random.uniform(k1, (b, 1), minval=snr_lo, maxval=snr_hi)
    if speech_noise is not None:
        snr_sp = jax.random.uniform(k1, (b, 1), minval=10.0, maxval=30.0)
        snr = jnp.where(speech_noise[:, None], snr_sp, snr)
    power = jnp.mean(mix**2, -1, keepdims=True)
    n_power = jnp.mean(noise**2, -1, keepdims=True)
    scale = 10 ** (-snr / 20.0) * jnp.sqrt(power) / jnp.sqrt(
        jnp.maximum(n_power, 1e-10)
    )
    noisy = mix + scale * noise
    coin = jax.random.uniform(k2, (b, 1)) < prob
    return jnp.where(coin, noisy, mix)


def augment_batch(
    key,
    srcs: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    cfg: Optional[RirConfig] = None,
    reverb_prob: float = 0.0,
    use_random_snr: bool = True,
    noise_prob: float = 0.0,
    noise_snr: Tuple[float, float] = (-5.0, 25.0),
):
    """Full on-device simulation: (optional) FRAM-RIR reverb per source ->
    SNR mixing -> (optional) additive noise.

    srcs: [B, S, T] dry sources; noise: [B, T] noise chunks.
    Returns (mix [B, T], targets [B, S, T]); like the reference chain,
    reverberant sources become both mixture components and targets
    (add_reverb overwrites wav_spk*, processor.py:779 — the model learns
    TSE on the reverberant target; noise is mixture-only).
    """
    k_rir, k_rev, k_mix, k_noise = jax.random.split(key, 4)
    mix_srcs = srcs
    if reverb_prob > 0:
        cfg = cfg or RirConfig(num_src=srcs.shape[1])
        rirs, _ = sample_rirs(k_rir, srcs.shape[0], cfg)
        mix_srcs = reverberate(k_rev, srcs, rirs, reverb_prob)
    mix, scaled = snr_mix(k_mix, mix_srcs, use_random_snr)
    if noise is not None and noise_prob > 0:
        mix = add_noise_snr(
            k_noise, mix, noise, noise_snr[0], noise_snr[1], noise_prob
        )
    return mix, scaled
