"""bench.py outage guard: a TPU-relay outage must yield ONE parseable
JSON failure line, never a traceback (the round-2 capture died at
jax.devices() with rc=1 and parsed=null — BENCH_r02.json)."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


def test_wait_gives_up_within_window():
    clock = FakeClock()
    ok, detail = bench.wait_for_backend(
        window_sec=900,
        socket_probe=lambda: False,
        backend_probe=lambda: (False, "unused"),
        sleep=clock.sleep,
        clock=clock,
        remote_compile=True,
    )
    assert not ok
    assert "refused" in detail
    # bounded: gave up at the window, not before, not unboundedly after
    assert 900 <= clock.t <= 960


def test_wait_retries_through_transient_outage():
    clock = FakeClock()
    state = {"n": 0}

    def flaky_backend():
        state["n"] += 1
        return (state["n"] >= 3), "backend down"

    ok, detail = bench.wait_for_backend(
        window_sec=900,
        socket_probe=lambda: True,
        backend_probe=flaky_backend,
        sleep=clock.sleep,
        clock=clock,
        remote_compile=True,
    )
    assert ok and detail == ""
    assert state["n"] == 3
    assert clock.t < 120  # recovered after two backoffs, long before window


def test_backoff_is_capped_and_monotone():
    clock = FakeClock()
    sleeps = []

    def sleep(dt):
        sleeps.append(dt)
        clock.sleep(dt)

    bench.wait_for_backend(
        window_sec=600,
        socket_probe=lambda: True,
        backend_probe=lambda: (False, "down"),
        sleep=sleep,
        clock=clock,
        remote_compile=False,
    )
    assert sleeps[0] == 10.0
    assert max(sleeps) <= 60.0
    # non-decreasing until the cap; final sleep may be clipped to window
    body = sleeps[:-1]
    assert all(a <= b for a, b in zip(body, body[1:]))


def test_main_emits_structured_failure_json(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda: (False, "relay refused")
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["error"] == "tpu-relay-down"
    assert rec["metric"] == bench.METRIC
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "relay refused" in rec["detail"]


def test_main_crash_path_emits_json_line(monkeypatch, capsys):
    """Even an unexpected exception must leave a parseable last line."""
    monkeypatch.setattr(bench, "wait_for_backend", lambda: (True, ""))

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench, "main", boom)
    # exercise the __main__ guard body directly
    try:
        bench.main()
    except Exception as e:
        bench.emit_failure(type(e).__name__, str(e).splitlines()[-1][:500])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["error"] == "RuntimeError"
    assert "axon" in rec["detail"]
