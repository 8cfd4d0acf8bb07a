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
    """PESQ via the optional `pesq` package; None if unavailable/silent
    (reference score.py:39-49)."""
    try:
        from pesq import pesq as _pesq

        mode = "wb" if fs == 16000 else "nb"
        return float(_pesq(fs, np.asarray(ref), np.asarray(est), mode))
    except Exception:
        return None


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
