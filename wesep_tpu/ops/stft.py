"""STFT / iSTFT as framed matmuls — MXU-friendly, fully jittable.

Instead of an FFT butterfly (scalar-heavy, TPU-hostile), the (i)STFT is
expressed as one big [frames x n_fft] @ [n_fft x F] real matmul against a
precomputed windowed Fourier basis, which XLA tiles straight onto the MXU.
This is the TPU-native analogue of the conv-based STFT template in the
reference (/root/reference/wesep/utils/signal.py:38-130) and numerically
matches torch.stft/torch.istft with center=True + reflect padding as used by
the reference models (/root/reference/wesep/models/bsrnn.py:309-316,382-389).

Conventions: waveforms are [B, T] float; spectrograms are returned as a
(real, imag) pair of [B, T_frames, F] arrays (freq-last so F sits on the
128-wide lane dimension). Complex dtypes are avoided on the compute path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "hamming_window",
    "frame_signal",
    "overlap_add",
    "stft",
    "istft",
    "magnitude",
    "stft_complex",
]


def hann_window(n: int, dtype=jnp.float32):
    """Periodic Hann window (parity with torch.hann_window(n))."""
    return (0.5 - 0.5 * jnp.cos(2.0 * np.pi * jnp.arange(n) / n)).astype(dtype)


def hamming_window(n: int, periodic: bool = True, dtype=jnp.float32):
    """Hamming window. periodic=True matches torch.hamming_window default."""
    denom = n if periodic else n - 1
    w = 0.54 - 0.46 * jnp.cos(2.0 * np.pi * jnp.arange(n) / denom)
    return w.astype(dtype)


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Slice [..., T] into overlapping frames [..., n_frames, frame_len].

    Gather-based framing; XLA lowers this to an efficient strided gather.
    n_frames = 1 + (T - frame_len) // hop  (snip-edges semantics).
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_len) // hop
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    )  # static [n_frames, frame_len]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int | None = None):
    """Overlap-add [..., n_frames, frame_len] -> [..., T] via scatter-add."""
    n_frames, frame_len = frames.shape[-2:]
    total = frame_len + hop * (n_frames - 1)
    if out_len is None:
        out_len = total
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (total,), frames.dtype)
    out = out.at[..., idx].add(frames)
    if out_len <= total:
        return out[..., :out_len]
    pad = [(0, 0)] * (out.ndim - 1) + [(0, out_len - total)]
    return jnp.pad(out, pad)


@functools.lru_cache(maxsize=16)
def _dft_bases(n_fft: int):
    """Forward rDFT bases as float64 numpy: cos/sin each [n_fft, F]."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    return np.cos(ang), -np.sin(ang)


@functools.lru_cache(maxsize=16)
def _idft_bases(n_fft: int):
    """Inverse rDFT bases [F, n_fft] (conjugate-symmetric expansion folded in)."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    k = np.arange(n_freq, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    scale = np.full((n_freq, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    return scale * np.cos(ang), -scale * np.sin(ang)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """STFT of [B, T] -> (real, imag), each [B, n_frames, n_fft//2+1].

    Matches torch.stft(x, n_fft, hop, window=..., center=True,
    pad_mode='reflect', return_complex=True) up to layout ([B,T,F] vs [B,F,T]).
    """
    if window is None:
        window = hann_window(n_fft)
    dtype = x.dtype
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    cos_b, sin_b = _dft_bases(n_fft)
    # Fold the window into the basis in jnp so traced windows work under jit;
    # for constant windows XLA constant-folds this into the basis.
    wf = window.astype(jnp.float32)[:, None]
    basis_c = wf * jnp.asarray(cos_b, dtype=jnp.float32)
    basis_s = wf * jnp.asarray(sin_b, dtype=jnp.float32)
    f32 = frames.astype(jnp.float32)
    re = jnp.matmul(f32, basis_c, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(f32, basis_s, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return re.astype(dtype), im.astype(dtype)


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | None = None,
    length: int | None = None,
    center: bool = True,
    eps: float = 1e-11,
):
    """Inverse STFT of (re, im) [B, n_frames, F] -> [B, T].

    Windowed inverse-DFT matmul + overlap-add, normalized by the
    overlap-added squared window (COLA), matching torch.istft semantics
    (center=True trims n_fft//2 from both ends; `length` crops/pads).
    """
    if window is None:
        window = hann_window(n_fft)
    dtype = re.dtype
    icos, isin = _idft_bases(n_fft)
    basis_c = jnp.asarray(icos, dtype=jnp.float32)
    basis_s = jnp.asarray(isin, dtype=jnp.float32)
    frames = jnp.matmul(
        re.astype(jnp.float32), basis_c, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ) + jnp.matmul(im.astype(jnp.float32), basis_s, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    w = window.astype(jnp.float32)
    y = overlap_add(frames * w[None, None, :], hop_length)
    n_frames = re.shape[-2]
    wsq = overlap_add(
        jnp.broadcast_to(w * w, (1, n_frames, n_fft)), hop_length
    )[0]
    y = y / jnp.maximum(wsq, eps)
    if center:
        half = n_fft // 2
        y = y[..., half:]
        if length is None:
            y = y[..., : y.shape[-1] - half]
    if length is not None:
        if length <= y.shape[-1]:
            y = y[..., :length]
        else:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pad)
    return y.astype(dtype)


def magnitude(re: jnp.ndarray, im: jnp.ndarray, eps: float = 0.0):
    """|X| from a (re, im) pair."""
    return jnp.sqrt(re * re + im * im + eps)


def stft_complex(x, n_fft, hop_length, window=None, center=True):
    """Convenience complex64 STFT (for tests / scoring; not the hot path)."""
    re, im = stft(x, n_fft, hop_length, window=window, center=center)
    return jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
