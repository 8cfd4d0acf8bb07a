"""Numpy audio quality metrics for scoring/inference.

Equivalent of /root/reference/wesep/utils/score.py (numpy SI-SNR,
SI-SNRi, normalized PESQ hook, batch evaluation). PESQ/DNSMOS depend on
optional packages not present in this image and are gated; STOI/ESTOI are
implemented natively in wesep_tpu.utils.stoi.
"""

from typing import List, Optional

import numpy as np

__all__ = ["cal_SISNR", "cal_SISNRi", "cal_SNR", "cal_PESQ",
           "cal_PESQ_norm", "batch_evaluation"]

EPS = 1e-8


def cal_SISNR(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR in dB (reference score.py:7-21)."""
    est = np.asarray(est, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    assert est.shape == ref.shape
    est = est - est.mean()
    ref = ref - ref.mean()
    t = np.dot(est, ref) * ref / (np.dot(ref, ref) + EPS)
    return float(
        10 * np.log10((t**2).sum() / (((est - t) ** 2).sum() + EPS) + EPS)
    )


def cal_SISNRi(est: np.ndarray, ref: np.ndarray, mix: np.ndarray):
    """(SI-SNR, SI-SNR improvement vs mixture) (reference score.py:24-36)."""
    sisnr = cal_SISNR(est, ref)
    base = cal_SISNR(mix, ref)
    return sisnr, sisnr - base


def cal_SNR(est: np.ndarray, ref: np.ndarray) -> float:
    est = np.asarray(est, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    return float(
        10 * np.log10((ref**2).sum() / (((ref - est) ** 2).sum() + EPS) + EPS)
    )


def cal_PESQ(est: np.ndarray, ref: np.ndarray, fs: int = 16000
             ) -> Optional[float]:
    """PESQ MOS-LQO (reference score.py:39-49).

    Uses the external ITU `pesq` package when installed (bit-exact
    P.862); otherwise falls back to the in-repo jittable P.862 model
    (wesep_tpu.ops.pesq) with a crude cross-correlation time alignment.
    Returns None on silent/degenerate inputs like the reference.
    """
    est = np.asarray(est, np.float32).reshape(-1)
    ref = np.asarray(ref, np.float32).reshape(-1)
    if (ref ** 2).mean() <= 1e-12 or (est ** 2).mean() <= 1e-12:
        return None
    try:
        from pesq import pesq as _pesq

        mode = "wb" if fs == 16000 else "nb"
        return float(_pesq(fs, ref, est, mode))
    except ImportError:
        pass
    except Exception:
        return None
    try:
        from wesep_tpu.ops.pesq import pesq_batch

        est = _crude_align(ref, est, fs=fs)
        n = min(len(ref), len(est))
        score = pesq_batch(ref[None, :n], est[None, :n], fs)[0]
        return float(score) if np.isfinite(score) else None
    except Exception:
        return None


def _crude_align(ref: np.ndarray, est: np.ndarray,
                 max_shift_s: float = 0.5, fs: int = 16000) -> np.ndarray:
    """Shift `est` to the delay maximizing envelope cross-correlation
    (stand-in for P.862 utterance alignment; separation outputs are
    normally already sample-aligned, giving shift 0)."""
    n = min(len(ref), len(est))
    hop = 64
    env_r = np.abs(ref[:n]).reshape(-1, hop).mean(-1) if n % hop == 0 else \
        np.abs(ref[: n - n % hop]).reshape(-1, hop).mean(-1)
    env_e = np.abs(est[:n]) if n % hop == 0 else np.abs(est[: n - n % hop])
    env_e = env_e.reshape(-1, hop).mean(-1)
    max_lag = int(max_shift_s * fs / hop)
    f = len(env_r)
    pad = np.zeros(max_lag, env_r.dtype)
    xr = np.concatenate([pad, env_r - env_r.mean(), pad])
    corr = np.correlate(xr, env_e - env_e.mean(), mode="valid")
    lag = (int(np.argmax(corr)) - max_lag) * hop
    if lag == 0:
        return est
    if lag > 0:  # est is early: delay it
        return np.concatenate([np.zeros(lag, est.dtype), est[:-lag]])
    return np.concatenate([est[-lag:], np.zeros(-lag, est.dtype)])


def cal_PESQ_norm(est: np.ndarray, ref: np.ndarray, fs: int = 16000
                  ) -> Optional[float]:
    """PESQ mapped to (0, 1) (reference score.py:52-55)."""
    p = cal_PESQ(est, ref, fs)
    if p is None:
        return None
    return (p + 0.5) / 5.0


def batch_evaluation(metric, ests: List, refs: List, n_jobs: int = 1):
    """Apply metric over pairs; joblib-parallel if available
    (reference score.py:94-137)."""
    if n_jobs > 1:
        try:
            from joblib import Parallel, delayed

            return Parallel(n_jobs=n_jobs)(
                delayed(metric)(e, r) for e, r in zip(ests, refs)
            )
        except Exception:
            pass
    return [metric(e, r) for e, r in zip(ests, refs)]
