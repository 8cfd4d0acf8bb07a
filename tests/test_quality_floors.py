"""Pinned synthetic-convergence floors per model family (r4 VERDICT #5).

Runs tools/validate_synthetic end to end (shard build -> bin.train ->
bin.infer) with fixed seeds and asserts frozen SI-SNRi floors. Any
numerics regression that silently degrades separation quality — a bad
kernel rewrite, a dtype change that breaks training, a broken gradient
path — fails these gates even though shape/parity tests still pass.
Floors are set ~2-3 dB under the measured values (BASELINE.md: BSRNN
+19.2 @6ep, DPCCN +15.1 @4ep, SpEx+/ConvTasNet +8.5 @12ep, online-mix
+13.8 @8ep) so platform-level fp noise doesn't flake them, while real
regressions (which cost >3 dB or break convergence outright) cannot
hide.

Slow-marked: the full battery trains five small models to convergence
(~25 min on the CPU test harness; chunk_len 8000 keeps the XLA compile
of each scan graph tractable — the recipe-scale 32000-sample chunks
compile for tens of minutes on CPU). Calibrated r4 on this harness:
BSRNN +9.7 @3ep, DPCCN +8.4 @3ep, ConvTasNet +4.9 @16ep, TF-GridNet
+7.2 @10ep, online-mix +6.6 @5ep.
The reference's analogue is running whole recipes and reading
infer.log (wesep/bin/infer.py:190-194) — this is that check, hermetic.
"""

import pytest

_SMALL = dict(chunk_len=8000, utts_per_spk=8, batch_size=8)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,kwargs,floor",
    [
        ("bsrnn", dict(model="BSRNN", num_epochs=3), 7.0),
        ("dpccn", dict(model="DPCCN", num_epochs=3), 5.5),
        ("spexplus", dict(model="ConvTasNet", num_epochs=16), 2.0),
        ("tfgridnet", dict(model="TFGridNet", num_epochs=10), 4.0),
        ("online_mix", dict(num_epochs=5, online_mix=True), 3.5),
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
