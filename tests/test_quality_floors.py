"""Pinned synthetic-convergence floors per model family (r4 VERDICT #5).

Runs tools/validate_synthetic end to end (shard build -> bin.train ->
bin.infer) with fixed seeds and asserts frozen SI-SNRi floors. Any
numerics regression that silently degrades separation quality — a bad
kernel rewrite, a dtype change that breaks training, a broken gradient
path — fails these gates even though shape/parity tests still pass.
Floors are pinned ~1 dB under min(CPU-harness, on-chip) calibration at
the EXACT gate config (r4 VERDICT #3 tightening: the old 2-3 dB slack
let a 2.5 dB silent regression through). Calibrations at chunk_len
8000, utts_per_spk 8, batch 8 — CPU (r4) / one v5e chip (r5, bf16,
all Pallas kernels active):
BSRNN +9.7 / +9.65 @3ep; DPCCN +8.4 / +8.37 @3ep; ConvTasNet +4.9 /
+4.46 @16ep; TF-GridNet +7.2 / +7.17 @10ep; online-mix +6.6 / +6.63
@5ep; GAN (BSRNN + CMGAN + on-device P.862) +11.82 @4ep on BOTH.
The two platforms agree within 0.45 dB everywhere, so one floor per
family gates both.

Slow-marked: the full battery trains the models to convergence
(~25 min on the CPU test harness; chunk_len 8000 keeps the XLA compile
of each scan graph tractable — the recipe-scale 32000-sample chunks
compile for tens of minutes on CPU).
The reference's analogue is running whole recipes and reading
infer.log (wesep/bin/infer.py:190-194) — this is that check, hermetic.
"""

import pytest

_SMALL = dict(chunk_len=8000, utts_per_spk=8, batch_size=8)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,kwargs,floor",
    [
        ("bsrnn", dict(model="BSRNN", num_epochs=3), 8.5),
        ("dpccn", dict(model="DPCCN", num_epochs=3), 7.3),
        ("spexplus", dict(model="ConvTasNet", num_epochs=16), 3.4),
        ("tfgridnet", dict(model="TFGridNet", num_epochs=10), 6.1),
        ("online_mix", dict(num_epochs=5, online_mix=True), 5.6),
        ("gan", dict(model="BSRNN", num_epochs=4, gan=True), 10.8),
    ],
)
def test_synthetic_convergence_floor(tmp_path, name, kwargs, floor):
    from wesep_tpu.tools.validate_synthetic import run

    sisnri = run(str(tmp_path / name), **_SMALL, **kwargs)
    assert sisnri >= floor, (
        f"{name}: synthetic SI-SNRi {sisnri:.2f} dB fell below the "
        f"pinned floor {floor} dB — a quality regression upstream of "
        "the parity tests"
    )
