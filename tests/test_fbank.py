"""Kaldi-fbank / mel-spectrogram parity tests.

torchaudio is not available in this image, so parity is checked against a
straight-line numpy transliteration of the kaldi fbank spec (the same
algorithm the reference consumes through torchaudio.compliance.kaldi and
implements natively in runtime/frontend/fbank.h).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import wesep_tpu.ops.fbank as F


def _numpy_kaldi_fbank(wav, sr=16000, n_mels=23, frame_ms=25.0, shift_ms=10.0):
    """Reference kaldi fbank: independent numpy implementation (float64)."""
    win = int(sr * frame_ms / 1000)
    hop = int(sr * shift_ms / 1000)
    padded = 1
    while padded < win:
        padded *= 2
    n_frames = 1 + (len(wav) - win) // hop
    out = np.zeros((n_frames, n_mels))
    window = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(win) / (win - 1))

    # mel bank
    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    nfft_bins = padded // 2
    low, high = 20.0, sr / 2.0
    mlo, mhi = mel(low), mel(high)
    d = (mhi - mlo) / (n_mels + 1)
    freqs = np.arange(nfft_bins) * sr / padded
    fmel = mel(freqs)
    bank = np.zeros((n_mels, nfft_bins))
    for m in range(n_mels):
        left, center, right = mlo + m * d, mlo + (m + 1) * d, mlo + (m + 2) * d
        up = (fmel - left) / (center - left)
        down = (right - fmel) / (right - center)
        bank[m] = np.maximum(0, np.minimum(up, down))

    for i in range(n_frames):
        fr = wav[i * hop : i * hop + win].astype(np.float64).copy()
        fr -= fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * window
        spec = np.fft.rfft(fr, n=padded)
        power = np.abs(spec) ** 2
        melspec = bank @ power[:nfft_bins]
        out[i] = np.log(np.maximum(melspec, np.finfo(np.float32).eps))
    return out


def test_kaldi_fbank_matches_spec():
    rng = np.random.default_rng(7)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    ref = _numpy_kaldi_fbank(wav * 32768.0, n_mels=80)
    got = np.asarray(
        F.kaldi_fbank(jnp.asarray(wav), 16000, num_mel_bins=80, input_scale=32768.0)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_kaldi_fbank_batched_consistent():
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((3, 8000)).astype(np.float32)
    batched = np.asarray(F.kaldi_fbank(jnp.asarray(wav)))
    for i in range(3):
        single = np.asarray(F.kaldi_fbank(jnp.asarray(wav[i])))
        # batched vs single matmul tilings differ in reduction order; log()
        # amplifies tiny power differences near the eps floor
        np.testing.assert_allclose(batched[i], single, atol=5e-3)


def test_melspectrogram_against_torch_manual():
    """Cross-check against torch.stft-based mel computation (htk scale)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(11)
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    n_fft, hop, n_mels, sr = 512, 128, 80, 16000
    got = np.asarray(
        F.melspectrogram(jnp.asarray(wav), sr, n_fft, hop, n_mels=n_mels)
    )
    win = torch.hamming_window(n_fft)
    spec = torch.stft(
        torch.from_numpy(wav),
        n_fft,
        hop,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    power = spec.abs().numpy() ** 2  # [B, F, T]
    bank = np.asarray(F.htk_mel_banks(n_fft // 2 + 1, 20.0, sr / 2.0, n_mels, sr))
    ref = np.einsum("bft,fm->btm", power, bank)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-3)


def test_speaker_feat_shape_and_norm():
    rng = np.random.default_rng(5)
    wav = rng.standard_normal((2, 48000)).astype(np.float32)
    feat = np.asarray(F.speaker_feat(jnp.asarray(wav)))
    assert feat.shape == (2, 48000 // 128 + 1, 80)
    # per-(batch, mel) mean over time must be ~0
    np.testing.assert_allclose(feat.mean(axis=1), 0.0, atol=1e-4)


def test_cmvn():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100, 80)))
    y = np.asarray(F.apply_cmvn(x, norm_mean=True, norm_var=True))
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=1), 1.0, atol=1e-3)
