"""Kaldi-compatible log-mel filterbank features, batched + jittable.

Reimplements the semantics the reference gets from
torchaudio.compliance.kaldi.fbank (window_type='hamming', use_energy=False;
see /root/reference/wesep/dataset/processor.py:480-512) and from the C++
runtime frontend (/root/reference/runtime/frontend/fbank.h:31-198):
  dither -> DC removal -> pre-emphasis 0.97 -> hamming window ->
  zero-pad to pow2 FFT -> power spectrum -> kaldi mel triangles -> log.

Also provides the torchaudio.transforms.MelSpectrogram-equivalent
(`melspectrogram`, htk mel scale, center/reflect pad) used by the joint
speaker-encoder branch (/root/reference/wesep/models/bsrnn.py:233-242), and
the matching log-mean-normalized speaker-feature frontend.

All spectra are computed as framed matmuls against a DFT basis (MXU path),
not FFT butterflies. Shapes: wav [B, T] -> feats [B, n_frames, n_mels].
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wesep_tpu.ops.stft import _dft_bases, frame_signal, stft

__all__ = [
    "kaldi_mel_banks",
    "htk_mel_banks",
    "kaldi_fbank",
    "melspectrogram",
    "speaker_feat",
    "apply_cmvn",
]

_EPS_F32 = float(np.finfo(np.float32).eps)


def _mel_kaldi(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz, np.float64) / 700.0)


def _mel_htk(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.lru_cache(maxsize=32)
def kaldi_mel_banks(
    num_bins: int,
    window_length_padded: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
):
    """Kaldi-style mel triangle bank, [num_fft_bins, num_bins] float64 numpy.

    num_fft_bins = window_length_padded // 2 (nyquist bin excluded), matching
    kaldi/torchaudio get_mel_banks.
    """
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_length_padded
    mel_low = _mel_kaldi(low_freq)
    mel_high = _mel_kaldi(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bin_id = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_id * mel_delta
    center_mel = mel_low + (bin_id + 1.0) * mel_delta
    right_mel = mel_low + (bin_id + 2.0) * mel_delta
    mel = _mel_kaldi(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[
        None, :
    ]
    up = (mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel) / (right_mel - center_mel)
    bank = np.maximum(0.0, np.minimum(up, down))
    return bank.T  # [num_fft_bins, num_bins]


@functools.lru_cache(maxsize=32)
def htk_mel_banks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: float,
):
    """torchaudio melscale_fbanks(htk, norm=None) equivalent: [n_freqs, n_mels]."""
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _mel_htk(f_min)
    m_max = _mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return np.maximum(0.0, np.minimum(down, up))  # [n_freqs, n_mels]


def kaldi_fbank(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    dither: float = 0.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    rng: jax.Array | None = None,
    input_scale: float = 1.0,
):
    """Kaldi log-mel fbank of [B, T] (or [T]) -> [B, n_frames, num_mel_bins].

    Snip-edges framing, hamming window, pow2-padded DFT, power spectrum.
    `input_scale` lets callers apply the reference's x * 2**15 int16 scaling
    (/root/reference/wesep/dataset/processor.py:500-501) without materializing
    a scaled copy. Pass `rng` to enable dithering (dither > 0).
    """
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    wav = wav.astype(jnp.float32) * input_scale
    win_size = int(sample_rate * frame_length_ms / 1000.0)
    hop = int(sample_rate * frame_shift_ms / 1000.0)
    padded = _next_pow2(win_size)

    frames = frame_signal(wav, win_size, hop)  # [B, NF, win]
    if dither > 0.0 and rng is not None:
        frames = frames + dither * jax.random.normal(rng, frames.shape)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        # kaldi: x[0] -= coef * x[0]; x[i] -= coef * x[i-1]
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    # hamming (kaldi windows are symmetric: denominator win_size - 1)
    n = np.arange(win_size, dtype=np.float64)
    window = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (win_size - 1))

    # Zero-padding the frame to `padded` then DFT == matmul against the first
    # win_size rows of the padded-length DFT basis, with the window folded in.
    cos_b, sin_b = _dft_bases(padded)
    wcos = window[:, None] * cos_b[:win_size]
    wsin = window[:, None] * sin_b[:win_size]
    re = jnp.matmul(
        frames, jnp.asarray(wcos, jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    im = jnp.matmul(
        frames, jnp.asarray(wsin, jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    power = re * re + im * im  # [B, NF, padded//2 + 1]
    bank = kaldi_mel_banks(num_mel_bins, padded, float(sample_rate), low_freq, high_freq)
    mel = jnp.matmul(
        power[..., :-1],  # nyquist bin excluded by kaldi banks
        jnp.asarray(bank, jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    feats = jnp.log(jnp.maximum(mel, _EPS_F32))
    return feats[0] if squeeze else feats


def melspectrogram(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    f_min: float = 20.0,
    f_max: float | None = None,
    n_mels: int = 80,
    window: jnp.ndarray | None = None,
    power: float = 2.0,
):
    """torchaudio.transforms.MelSpectrogram equivalent -> [B, n_frames, n_mels].

    center=True/reflect, htk mel scale, norm=None — the configuration of the
    joint speaker-encoder frontend (/root/reference/wesep/models/bsrnn.py:234-242,
    which passes window_fn=torch.hamming_window).
    """
    from wesep_tpu.ops.stft import hamming_window

    if window is None:
        window = hamming_window(n_fft)
    if f_max is None:
        f_max = sample_rate / 2.0
    re, im = stft(wav, n_fft, hop_length, window=window, center=True)
    spec = re * re + im * im
    if power != 2.0:
        spec = jnp.power(jnp.sqrt(spec), power)
    bank = htk_mel_banks(n_fft // 2 + 1, f_min, f_max, n_mels, float(sample_rate))
    return jnp.matmul(
        spec, jnp.asarray(bank, jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


def speaker_feat(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    n_mels: int = 80,
    preemph_coef: float = 0.97,
):
    """'consistent' speaker-encoder frontend: PreEmphasis -> MelSpectrogram ->
    log(+1e-8) -> per-mel mean subtraction -> [B, T, n_mels].

    Mirrors the no-grad block at /root/reference/wesep/models/bsrnn.py:343-350.
    The caller is responsible for stop_gradient if desired.
    """
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    # reflect-padded pre-emphasis (reference PreEmphasis,
    # /root/reference/wesep/modules/common/speaker.py:10-23)
    first = wav[..., 1:2]  # reflect pad left by 1
    padded = jnp.concatenate([first, wav], axis=-1)
    emph = padded[..., 1:] - preemph_coef * padded[..., :-1]
    mel = melspectrogram(
        emph,
        sample_rate=sample_rate,
        n_fft=n_fft,
        hop_length=hop_length,
        n_mels=n_mels,
    )
    logmel = jnp.log(mel + 1e-8)
    # reference subtracts the per-(batch, mel) mean over time: input to mean is
    # [B, n_mels, T] with dim=-1 -> mean over T.
    logmel = logmel - jnp.mean(logmel, axis=-2, keepdims=True)
    return logmel[0] if squeeze else logmel


def apply_cmvn(feats: jnp.ndarray, norm_mean: bool = True, norm_var: bool = False):
    """Per-utterance cepstral mean/variance normalization over time axis (-2)."""
    if norm_mean:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    if norm_var:
        feats = feats / jnp.sqrt(jnp.var(feats, axis=-2, keepdims=True) + 1e-8)
    return feats
