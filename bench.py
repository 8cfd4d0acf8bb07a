"""Benchmark: BSRNN training-step throughput on the current device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: audio-seconds of mixture processed per wall-clock second by the
full compiled training step (fwd + bwd + per-param clip + Adam) of the
flagship BSRNN at the reference recipe's training envelope — batch 16
(the A800 setting of the reference conf, batch 8 on V100 —
examples/librimix/tse/v2/confs/bsrnn.yaml:2), 3 s chunks @16 kHz,
feature_dim 128, num_repeat 6 — in the production training
configuration (bf16 compute, f32 params/accum, Pallas LSTM kernels,
no rematerialization: the memory-lean LSTM residuals fit batch 16 in
16G HBM). The reference publishes no throughput numbers
(BASELINE.md), so vs_baseline is the ratio to the pinned
first-measurement value below (f32 lax.scan, round-1 day 1).

The same run also measures the other three flagship families (SpEx+,
DPCCN, TF-GridNet) at their reference envelopes via tools/bench_models;
their throughput + ledger-corrected MFU ride in the "details" field of
the same single JSON line and in BENCH_DETAILS.json.
"""

import json
import os
import socket
import subprocess
import sys
import time

# First recorded value on one TPU v5e chip (round 1, f32 + lax.scan
# recurrence). Later measurements compare against this.
BASELINE_AUDIO_SEC_PER_SEC = 48.0

METRIC = "bsrnn_train_audio_sec_per_sec_1chip"

# The TPU backend in this environment compiles through a host-side HTTP
# relay (PALLAS_AXON_REMOTE_COMPILE=1, 127.0.0.1:8093). When the relay is
# down, jax.devices() raises (or hangs) and a bare run would record an
# unparseable traceback as the round's perf evidence — exactly what
# happened in BENCH_r02.json. Guard: probe, retry with backoff for a
# bounded window, and on final failure emit ONE machine-readable JSON
# line with an "error" field.
RELAY_HOST = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
RELAY_PORT = int(os.environ.get("BENCH_RELAY_PORT", "8093"))
WAIT_WINDOW_SEC = float(os.environ.get("BENCH_RELAY_WAIT_SEC", "900"))


def _relay_socket_open(timeout=5.0):
    """True if the compile relay accepts TCP connections."""
    try:
        with socket.create_connection((RELAY_HOST, RELAY_PORT), timeout):
            return True
    except OSError:
        return False


def _backend_probe(timeout=180.0):
    """Initialize the JAX backend + run a trivial jit in a SUBPROCESS.

    A subprocess (under a hard timeout) is the only safe probe: when the
    relay dies mid-handshake, in-process jax.devices() can hang rather
    than raise, and no in-process guard can recover from that.
    Returns (ok, detail).
    """
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 8));"
        "v = float(jax.jit(lambda x: (x @ x).sum())(x));"
        "print('BENCH_PROBE_OK', len(jax.devices()), v)"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=os.environ,
        )
    except subprocess.TimeoutExpired:
        return False, "backend probe timed out (%.0fs)" % timeout
    if res.returncode == 0 and "BENCH_PROBE_OK" in res.stdout:
        return True, ""
    tail = (res.stderr or res.stdout).strip().splitlines()[-1:]
    return False, "backend probe rc=%d: %s" % (res.returncode, " ".join(tail))


def wait_for_backend(
    window_sec=WAIT_WINDOW_SEC,
    socket_probe=_relay_socket_open,
    backend_probe=_backend_probe,
    sleep=time.sleep,
    clock=time.monotonic,
    remote_compile=None,
):
    """Wait (bounded, with backoff) until the TPU backend is usable.

    Returns (ok, detail). Probes are injectable so the guard is testable
    without a real outage (tests/test_bench_guard.py).
    """
    if remote_compile is None:
        remote_compile = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
    deadline = clock() + window_sec
    backoff = 10.0
    detail = ""
    while True:
        if remote_compile and not socket_probe():
            detail = (
                "compile relay %s:%d refused connection"
                % (RELAY_HOST, RELAY_PORT)
            )
        else:
            ok, detail = backend_probe()
            if ok:
                return True, ""
        remaining = deadline - clock()
        if remaining <= 0:
            return False, detail
        sleep(min(backoff, remaining))
        backoff = min(backoff * 2, 60.0)


def emit_failure(error, detail=""):
    """The machine-readable failure record: same schema, value=None."""
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": None,
                "unit": "audio_s/s",
                "vs_baseline": None,
                "error": error,
                "detail": detail,
            }
        )
    )


def main():
    ok, detail = wait_for_backend()
    if not ok:
        emit_failure("tpu-relay-down", detail)
        return

    from wesep_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    from tools.bench_models import ENVELOPES, bench_one

    # All four flagship families at their reference recipe envelopes
    # (VERDICT r3 #1: one current table, every family captured per round).
    # BSRNN stays the headline metric; the others ride in "details".
    results = {}
    errors = {}
    for family in ("bsrnn", "spexplus", "dpccn", "tfgridnet"):
        try:
            results.update(bench_one(family, ENVELOPES[family]))
        except Exception as e:  # per-family: one flake must not kill all
            errors[family] = "%s: %s" % (
                type(e).__name__,
                (str(e).splitlines() or [""])[-1][:200])
    try:
        from tools.bench_models import bench_gan

        results.update(bench_gan())
    except Exception as e:
        errors["gan"] = "%s: %s" % (
            type(e).__name__, (str(e).splitlines() or [""])[-1][:200])

    try:
        # merge: tools/bench_runtime.py contributes serving-RTF entries
        # to the same file; don't wipe them
        merged = {}
        try:
            with open("BENCH_DETAILS.json") as f:
                merged = json.load(f)
        except (OSError, ValueError):
            pass
        merged.update(results)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(merged, f, indent=1)
    except OSError:
        pass

    headline = results.get("bsrnn_train_audio_sec_per_sec_1chip")
    if headline is None:
        emit_failure("bsrnn-bench-failed", errors.get("bsrnn", ""))
        raise SystemExit(1)

    record = {
        "metric": METRIC,
        "value": round(headline, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(headline / BASELINE_AUDIO_SEC_PER_SEC, 3),
        "details": results,
    }
    if errors:
        record["family_errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the record must stay parseable
        emit_failure(type(e).__name__,
                     (str(e).splitlines() or [""])[-1][:500])
        raise SystemExit(1)
