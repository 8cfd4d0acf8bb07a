"""Loss functions, jittable and batched, matching the reference loss table.

The reference dispatches by name to torch/auraloss/torchmetrics losses
(/root/reference/wesep/utils/losses.py:1-41). Here every loss is a pure
function `loss(est, ref) -> [B] per-example losses`; `.mean()` happens in
the train step (the reference also calls `.mean()`, executor.py:112-122).
Implemented natively on jnp so everything fuses into the compiled step:

  L1 / L2 / CE            (torch.nn.{L1Loss,MSELoss,CrossEntropyLoss})
  SISDR / SISNR           (auraloss.time.SISDRLoss: zero-mean, eps=1e-8,
                           returns the NEGATIVE ratio in dB)
  SNR                     (auraloss.time.SNRLoss)
  STFT                    (auraloss.freq.STFTLoss: spectral-convergence +
                           log-magnitude terms, fft 1024 / hop 256)
  MultiResolutionSTFT     (auraloss.freq.MultiResolutionSTFTLoss:
                           ffts [1024,2048,512], hops [120,240,50],
                           wins [600,1200,240])
  PIT                     (permutation-invariant wrapper over SI-SNR)
"""

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from wesep_tpu.ops.stft import hann_window, stft

EPS = 1e-8

__all__ = [
    "l1_loss",
    "l2_loss",
    "ce_loss",
    "si_sdr",
    "si_sdr_loss",
    "snr_loss",
    "stft_loss",
    "multi_resolution_stft_loss",
    "pit_si_snr_loss",
    "get_loss",
    "parse_loss",
]


def _flat2(x):
    return x.reshape(x.shape[0], -1)


def l1_loss(est, ref):
    return jnp.mean(jnp.abs(_flat2(est) - _flat2(ref)), axis=-1)


def l2_loss(est, ref):
    return jnp.mean(jnp.square(_flat2(est) - _flat2(ref)), axis=-1)


def ce_loss(logits, labels):
    """Cross entropy over integer class labels: logits [B, C], labels [B]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]


def si_sdr(est, ref, zero_mean: bool = True, eps: float = EPS):
    """Scale-invariant SDR in dB, per example. est/ref: [B, T]."""
    est = est.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    s_target = dot * ref / (jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)
    e_noise = est - s_target
    ratio = (jnp.sum(s_target**2, axis=-1) + eps) / (
        jnp.sum(e_noise**2, axis=-1) + eps
    )
    return 10.0 * jnp.log10(ratio)


def si_sdr_loss(est, ref):
    """Negative SI-SDR (auraloss.time.SISDRLoss semantics)."""
    return -si_sdr(est, ref)


def snr_loss(est, ref, zero_mean: bool = True, eps: float = EPS):
    """Negative SNR in dB (auraloss.time.SNRLoss semantics)."""
    est = est.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    num = jnp.sum(ref * ref, axis=-1)
    den = jnp.sum(jnp.square(ref - est), axis=-1)
    return -10.0 * jnp.log10((num + eps) / (den + eps))


def _stft_mag(x, fft_size, hop, win_length):
    win = hann_window(win_length)
    if win_length < fft_size:
        pad = (fft_size - win_length) // 2
        win = jnp.pad(win, (pad, fft_size - win_length - pad))
    re, im = stft(x, fft_size, hop, window=win, center=True)
    # clamp like auraloss (sqrt of clamped power, min 1e-8)
    return jnp.sqrt(jnp.clip(re * re + im * im, min=1e-8))


def stft_loss(
    est,
    ref,
    fft_size: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
):
    """Spectral convergence + log-STFT-magnitude loss, per example.

    Matches auraloss.freq.STFTLoss defaults (w_sc=1, w_log_mag=1, others 0).
    """
    est_m = _stft_mag(est, fft_size, hop, win_length)
    ref_m = _stft_mag(ref, fft_size, hop, win_length)
    axes = tuple(range(1, est_m.ndim))
    sc = jnp.sqrt(jnp.sum(jnp.square(ref_m - est_m), axis=axes)) / (
        jnp.sqrt(jnp.sum(jnp.square(ref_m), axis=axes)) + EPS
    )
    log_mag = jnp.mean(jnp.abs(jnp.log(ref_m) - jnp.log(est_m)), axis=axes)
    return w_sc * sc + w_log_mag * log_mag


def multi_resolution_stft_loss(
    est,
    ref,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
):
    """Sum of STFT losses over several resolutions (auraloss defaults)."""
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        total = total + stft_loss(est, ref, n_fft, hop, win)
    return total / len(fft_sizes)


def pit_si_snr_loss(est, ref):
    """Permutation-invariant negative SI-SNR. est/ref: [B, S, T].

    Enumerates the S! permutations (S is small — 2 or 3 in practice) and
    takes the best per example, like torchmetrics PIT over SI-SNR
    (reference losses.py:17-21).
    """
    import itertools

    n_spk = est.shape[1]
    losses = []
    for perm in itertools.permutations(range(n_spk)):
        per_spk = jnp.stack(
            [si_sdr_loss(est[:, i], ref[:, p]) for i, p in enumerate(perm)],
            axis=-1,
        )
        losses.append(jnp.mean(per_spk, axis=-1))
    return jnp.min(jnp.stack(losses, axis=-1), axis=-1)


_LOSSES: Dict[str, Callable] = {
    "L1": l1_loss,
    "L2": l2_loss,
    "CE": ce_loss,
    "SISDR": si_sdr_loss,
    "SISNR": si_sdr_loss,
    "SNR": snr_loss,
    "STFT": stft_loss,
    "MultiResolutionSTFT": multi_resolution_stft_loss,
    "PIT": pit_si_snr_loss,
}


def get_loss(name: str) -> Callable:
    if name not in _LOSSES:
        raise ValueError(f"Unknown loss {name!r}; have {sorted(_LOSSES)}")
    return _LOSSES[name]


def parse_loss(loss) -> list:
    """Name(s) -> list of loss fns (reference parse_loss, losses.py:34-41)."""
    if not isinstance(loss, (list, tuple)):
        loss = [loss]
    return [get_loss(name) for name in loss]


def is_ce(fn) -> bool:
    """True if `fn` is the CE loss (routed to spk_label in the train step,
    reference executor.py:112-119)."""
    return fn is ce_loss
