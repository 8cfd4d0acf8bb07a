"""Shared degradation battery for PESQ conformance tests.

Five degradation families spanning the quality range the MetricGAN
discriminator trains on (additive noise, band limitation, clipping,
multiplicative/MNRU noise, quantization), each with a physically ordered
severity scale. Used by tests/test_pesq_conformance.py (native-model
ranking + frozen golden scale) and tests/test_pesq_itu.py (conformance
vs the ITU `pesq` package, auto-activated when that dep is installed).
"""

import numpy as np
from scipy import signal as sp

FS = 16000


def speech_like(t=FS * 3, seed=0):
    """Band-limited modulated noise: energy envelope like speech."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(t).astype(np.float32)
    b, a = sp.butter(4, [100, 4000], btype="band", fs=FS)
    x = sp.lfilter(b, a, x).astype(np.float32)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * np.arange(t) / FS)
    x = x * env.astype(np.float32)
    return x / np.abs(x).max()


# each family lists degradation names mild -> severe
FAMILIES = {
    "awgn": ["awgn_30dB", "awgn_20dB", "awgn_10dB", "awgn_0dB"],
    "lowpass": [
        "lowpass_3500Hz", "lowpass_2000Hz", "lowpass_1000Hz",
        "lowpass_500Hz",
    ],
    "clip": ["clip_0.5", "clip_0.2", "clip_0.1", "clip_0.05"],
    "mnru": ["mnru_Q35dB", "mnru_Q25dB", "mnru_Q15dB", "mnru_Q5dB"],
    "quant": ["quant_8bit", "quant_6bit", "quant_4bit", "quant_3bit"],
}


def battery(x):
    """ref signal -> {name: degraded signal} covering all FAMILIES."""
    rng = np.random.default_rng(42)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    out = {}
    for snr in (30, 20, 10, 0):
        n = noise * np.sqrt(
            (x**2).mean() / (noise**2).mean()
        ) * 10 ** (-snr / 20)
        out[f"awgn_{snr}dB"] = (x + n).astype(np.float32)
    for fc in (3500, 2000, 1000, 500):
        b, a = sp.butter(6, fc, btype="low", fs=FS)
        out[f"lowpass_{fc}Hz"] = sp.lfilter(b, a, x).astype(np.float32)
    for c in (0.5, 0.2, 0.1, 0.05):
        out[f"clip_{c}"] = np.clip(x, -c, c).astype(np.float32)
    mn = rng.standard_normal(len(x)).astype(np.float32)
    for q in (35, 25, 15, 5):
        # MNRU-style speech-correlated (multiplicative) noise, P.810
        out[f"mnru_Q{q}dB"] = (x * (1.0 + mn * 10 ** (-q / 20))).astype(
            np.float32
        )
    for bits in (8, 6, 4, 3):
        step = 2.0 / (2**bits)
        out[f"quant_{bits}bit"] = (np.round(x / step) * step).astype(
            np.float32
        )
    return out


def kendall_tau(a, b):
    """Kendall rank correlation between two equal-length score lists."""
    assert len(a) == len(b) and len(a) > 1
    conc = disc = 0
    n = len(a)
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    return (conc - disc) / (n * (n - 1) / 2)
