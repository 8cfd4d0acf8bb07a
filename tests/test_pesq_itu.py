"""ITU conformance of the native P.862 model — auto-activates with `pesq`.

The reference scores batches with the ITU implementation via the `pesq`
PyPI package (/root/reference/wesep/utils/executor_gan.py:309-337,
wesep/utils/score.py:39-55). That package is not installable in this
offline environment, so this module importorskips: THE MOMENT the dep
becomes available (any environment with network or a vendored wheel),
`pytest tests/test_pesq_itu.py` runs full conformance with zero code
changes — ranking agreement (Kendall tau) and absolute scale vs ITU
PESQ over the 20-pair degradation battery, in both wide- and narrowband
modes. Tolerances encode the documented divergences of ops/pesq.py
(formula-generated bark tables, Terhardt threshold, truncated-FIR input
filters): scores need not be bit-identical, but the ranking the
MetricGAN discriminator trains on must match and the scale must stay
within a fraction of a MOS.
"""

import numpy as np
import pytest

pesq_pkg = pytest.importorskip(
    "pesq", reason="ITU conformance needs the `pesq` package (offline "
    "environments run tests/test_pesq_conformance.py instead)"
)

from pesq_battery import FS, battery, kendall_tau, speech_like  # noqa: E402

from wesep_tpu.ops.pesq import pesq_batch  # noqa: E402


def test_itu_conformance_wb():
    x = speech_like()
    degs = battery(x)
    names = list(degs)
    itu = [pesq_pkg.pesq(FS, x, degs[n], "wb") for n in names]
    refs = np.stack([x] * len(names))
    ours = np.asarray(
        pesq_batch(refs, np.stack([degs[n] for n in names]))
    )
    tau = kendall_tau(itu, list(map(float, ours)))
    assert tau >= 0.85, (tau, dict(zip(names, zip(itu, ours))))
    diffs = np.abs(np.asarray(itu) - ours)
    assert float(diffs.mean()) < 0.35, dict(zip(names, diffs))
    assert float(diffs.max()) < 0.8, dict(zip(names, diffs))


def test_itu_conformance_nb():
    x = speech_like()[::2].copy()  # 8 kHz
    degs = battery(x)  # battery is rate-agnostic
    names = [n for n in degs if not n.startswith("lowpass_3500")]
    itu = [pesq_pkg.pesq(8000, x, degs[n], "nb") for n in names]
    refs = np.stack([x] * len(names))
    ours = np.asarray(
        pesq_batch(refs, np.stack([degs[n] for n in names]), fs=8000)
    )
    tau = kendall_tau(itu, list(map(float, ours)))
    assert tau >= 0.85, (tau, dict(zip(names, zip(itu, ours))))
    diffs = np.abs(np.asarray(itu) - ours)
    assert float(diffs.mean()) < 0.35, dict(zip(names, diffs))


def test_itu_clean_anchor():
    x = speech_like()
    itu = pesq_pkg.pesq(FS, x, x, "wb")
    ours = float(pesq_batch(x[None], x[None])[0])
    assert abs(itu - ours) < 0.05, (itu, ours)
