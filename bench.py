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

BATCH = 16
CHUNK_SEC = 3.0
SR = 16000

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

    import numpy as np

    import jax
    import jax.numpy as jnp

    from wesep_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model = BSRNN(
        spk_emb_dim=256,
        sr=SR,
        win=512,
        stride=128,
        feature_dim=128,
        num_repeat=6,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=False,
        remat=False,
    )
    t = int(CHUNK_SEC * SR)
    rng = np.random.default_rng(0)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((BATCH, t)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((BATCH, t)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((BATCH, 256)).astype(np.float32)
        ),
        "spk_label": jnp.zeros((BATCH,), jnp.int32),
    }

    sched = exponential_decrease(
        num_epochs=150, epoch_iter=1000, initial_lr=1e-3, final_lr=2.5e-5,
        warm_up_epoch=0,
    )
    optimizer = make_optimizer(sched, weight_decay=1e-4, clip_grad=5.0)
    step = jax.jit(
        make_train_step(
            model, optimizer, [si_sdr_loss], compute_dtype=jnp.bfloat16
        ),
        donate_argnums=(0,),
    )
    state = init_train_state(model, jax.random.PRNGKey(0), batch, optimizer)

    # warmup / compile. NOTE: through the axon relay block_until_ready does
    # not reliably synchronize — fetching the scalar to host does. Several
    # warmup steps: the first executions after compile run slow paths.
    for _ in range(5):
        state, metrics = step(state, batch)
        float(metrics["loss"])

    # best of 3 windows: the remote relay occasionally injects one slow
    # round trip, which a single window would report as a regression
    n_steps = 10
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])  # forces the whole dependency chain
        elapsed = min(elapsed, time.perf_counter() - start)

    audio_sec_per_sec = BATCH * CHUNK_SEC * n_steps / elapsed

    details = {
        "bsrnn_train_audio_sec_per_sec_1chip": round(audio_sec_per_sec, 2),
        "bsrnn_train_ms_per_step": round(elapsed / n_steps * 1e3, 2),
    }
    details.update(_mfu(step, state, batch, elapsed / n_steps))
    try:
        # merge: tools/bench_runtime.py contributes serving-RTF entries
        # to the same file; don't wipe them
        merged = {}
        try:
            with open("BENCH_DETAILS.json") as f:
                merged = json.load(f)
        except (OSError, ValueError):
            pass
        merged.update(details)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(merged, f, indent=1)
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "bsrnn_train_audio_sec_per_sec_1chip",
                "value": round(audio_sec_per_sec, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(
                    audio_sec_per_sec / BASELINE_AUDIO_SEC_PER_SEC, 3
                ),
            }
        )
    )


def _mfu(step, state, batch, sec_per_step):
    """Model-FLOPs-utilization of the compiled train step (XLA's own
    flop count / measured time / chip peak). v5e peak: 197 TFLOP/s bf16."""
    try:
        compiled = step.lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops <= 0:
            return {}
        peak = 197e12
        mfu = flops / sec_per_step / peak
        return {
            "bsrnn_train_gflops_per_step": round(flops / 1e9, 1),
            "bsrnn_train_mfu_pct_v5e_bf16": round(mfu * 100, 2),
        }
    except Exception:
        return {}


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the record must stay parseable
        emit_failure(type(e).__name__, str(e).splitlines()[-1][:500])
        raise SystemExit(1)
