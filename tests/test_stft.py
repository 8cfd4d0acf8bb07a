"""Numerical parity of the matmul STFT/iSTFT against torch.stft/istft."""

import numpy as np
import pytest

import jax.numpy as jnp

import wesep_tpu.ops.stft as S

torch = pytest.importorskip("torch")


def _rand_wav(b=2, t=16000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (128, 64), (400, 160)])
def test_stft_matches_torch(n_fft, hop):
    x = _rand_wav()
    win = np.asarray(S.hann_window(n_fft))
    re, im = S.stft(jnp.asarray(x), n_fft, hop, window=jnp.asarray(win))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(win),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )  # [B, F, T]
    ref_re = ref.real.numpy().transpose(0, 2, 1)
    ref_im = ref.imag.numpy().transpose(0, 2, 1)
    assert re.shape == ref_re.shape
    np.testing.assert_allclose(np.asarray(re), ref_re, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref_im, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (128, 64)])
def test_istft_matches_torch(n_fft, hop):
    x = _rand_wav(t=12345)
    win = np.asarray(S.hann_window(n_fft))
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(win),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    ref = torch.istft(
        spec,
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(win),
        length=x.shape[-1],
    ).numpy()
    re = jnp.asarray(spec.real.numpy().transpose(0, 2, 1))
    im = jnp.asarray(spec.imag.numpy().transpose(0, 2, 1))
    y = S.istft(re, im, n_fft, hop, window=jnp.asarray(win), length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-4)


def test_roundtrip_reconstruction():
    """COLA round-trip: istft(stft(x)) == x (away from edge effects)."""
    x = _rand_wav(b=1, t=48000)
    re, im = S.stft(jnp.asarray(x), 512, 128)
    y = np.asarray(S.istft(re, im, 512, 128, length=48000))
    np.testing.assert_allclose(y[0], x[0], atol=1e-4)


def test_windows_match_torch():
    np.testing.assert_allclose(
        np.asarray(S.hann_window(512)), torch.hann_window(512).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(S.hamming_window(400)),
        torch.hamming_window(400).numpy(),
        atol=1e-6,
    )


def test_overlap_add_matches_funcs():
    """overlap_add inverts frame_signal when hop == frame_len (identity)."""
    x = _rand_wav(b=1, t=1024)
    frames = S.frame_signal(jnp.asarray(x), 128, 128)
    y = S.overlap_add(frames, 128)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-7)
