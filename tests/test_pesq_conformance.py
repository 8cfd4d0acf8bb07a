"""Native P.862 model: ranking battery + frozen golden scale.

The ITU implementation the reference uses (`pesq` C extension,
/root/reference/wesep/utils/executor_gan.py:309-337) is not installable
here (no egress), so true ITU cross-validation lives in
tests/test_pesq_itu.py and auto-activates when the dep appears. These
tests pin the strongest offline properties:

  * within-family strict monotonicity over 5 degradation families
    (additive, band-limit, clipping, multiplicative, quantization) — the
    rankings the MetricGAN discriminator actually trains on;
  * cross-family scale sanity at the extremes;
  * a FROZEN golden table of the validated round-3 scores: any future
    edit to ops/pesq.py that drifts the scale or reorders the battery
    fails here and must consciously re-freeze.
"""

import numpy as np

from pesq_battery import FAMILIES, battery, speech_like

from wesep_tpu.ops.pesq import pesq_batch

# scores of ops/pesq.py as validated in round 3 (see VERDICT round-2 #3);
# regenerate CONSCIOUSLY with the snippet in this file's git history if a
# model improvement re-anchors the scale.
GOLDEN = {
    "awgn_30dB": 3.4179,
    "awgn_20dB": 2.4897,
    "awgn_10dB": 1.6116,
    "awgn_0dB": 1.1944,
    "lowpass_3500Hz": 4.4477,
    "lowpass_2000Hz": 3.8894,
    "lowpass_1000Hz": 2.6642,
    "lowpass_500Hz": 1.8974,
    "clip_0.5": 3.5761,
    "clip_0.2": 1.8557,
    "clip_0.1": 1.5155,
    "clip_0.05": 1.3870,
    "mnru_Q35dB": 4.2862,
    "mnru_Q25dB": 3.8377,
    "mnru_Q15dB": 2.5604,
    "mnru_Q5dB": 1.3461,
    "quant_8bit": 4.1776,
    "quant_6bit": 3.3246,
    "quant_4bit": 2.0170,
    "quant_3bit": 1.3511,
}


def _scores():
    x = speech_like()
    degs = battery(x)
    names = list(degs)
    refs = np.stack([x] * len(names))
    ds = np.stack([degs[n] for n in names])
    vals = np.asarray(pesq_batch(refs, ds))
    return dict(zip(names, [float(v) for v in vals]))


def test_within_family_monotonic():
    s = _scores()
    for fam, names in FAMILIES.items():
        seq = [s[n] for n in names]
        assert all(a > b for a, b in zip(seq, seq[1:])), (fam, seq)


def test_cross_family_scale_sanity():
    s = _scores()
    # mild degradations stay in the "good" range ...
    for mild in ("lowpass_3500Hz", "mnru_Q35dB", "quant_8bit"):
        assert s[mild] > 3.9, (mild, s[mild])
    # ... severe ones in the "bad" range
    for severe in ("awgn_0dB", "clip_0.05", "mnru_Q5dB", "quant_3bit"):
        assert s[severe] < 1.6, (severe, s[severe])
    # and the families interleave plausibly: heavy band-limiting is
    # better than heavy additive noise at these operating points
    assert s["lowpass_500Hz"] > s["awgn_0dB"]


def test_golden_scale_frozen():
    s = _scores()
    assert set(s) == set(GOLDEN)
    for name, want in GOLDEN.items():
        assert abs(s[name] - want) < 0.05, (name, s[name], want)


def test_identical_signal_ceiling():
    """External scale anchor that needs no ITU data: the zero-
    disturbance ceiling of P.862.2 (wideband) MOS-LQO is 4.6439 — a
    widely documented property of the ITU reference implementation
    (e.g. the `pesq` package's wb mode returns 4.6439 for identical
    inputs). Our independent implementation must land on the same
    ceiling, anchoring the TOP of the scale to the standard rather
    than to frozen self-outputs. (The ITU conformance VECTORS are
    license-gated and unobtainable offline; tests/test_pesq_itu.py
    auto-activates the full cross-check when the dep appears.)"""
    x = speech_like()
    val = float(np.asarray(pesq_batch(x[None], x[None]))[0])
    assert abs(val - 4.6439) < 2e-3, val
