"""Profiling + throughput observability.

The reference has no training-time tracing (SURVEY §5) — only thop MACs
prints and runtime RTF logs. TPU-native replacements:

  * `trace(logdir)` — context manager around jax.profiler for xplane
    traces viewable in TensorBoard/XProf;
  * `ThroughputMeter` — audio-seconds/sec/chip counters for train loops
    (the north-star metric in BASELINE.md);
  * `device_memory_stats()` — per-device HBM usage snapshot.
"""

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "ThroughputMeter", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/xplane profile of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Tracks steps + audio-seconds; reports per-chip throughput."""

    def __init__(self, sample_rate: int = 16000,
                 n_chips: Optional[int] = None):
        self.sample_rate = sample_rate
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self):
        self.steps = 0
        self.audio_sec = 0.0
        self.start = time.perf_counter()

    def update(self, batch):
        """Call once per step with the (host) batch dict."""
        wav = batch.get("wav_mix")
        if wav is not None and hasattr(wav, "shape") and len(wav.shape) == 2:
            self.audio_sec += (
                wav.shape[0] * wav.shape[1] / self.sample_rate
            )
        else:
            # device-augment batches: dry sources [B, S, T] expand into
            # B*S training rows on device
            srcs = batch.get("wav_srcs")
            if srcs is not None and len(getattr(srcs, "shape", ())) == 3:
                self.audio_sec += (
                    srcs.shape[0] * srcs.shape[1] * srcs.shape[2]
                    / self.sample_rate
                )
        self.steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    def audio_sec_per_sec(self) -> float:
        return self.audio_sec / max(self.elapsed, 1e-9)

    def audio_sec_per_sec_per_chip(self) -> float:
        return self.audio_sec_per_sec() / max(self.n_chips, 1)

    def summary(self) -> str:
        return (
            f"{self.steps} steps, {self.audio_sec:.0f} audio-s in "
            f"{self.elapsed:.1f}s -> {self.audio_sec_per_sec():.1f} "
            f"audio-s/s ({self.audio_sec_per_sec_per_chip():.1f}/chip)"
        )


def device_memory_stats():
    """{device: {bytes_in_use, bytes_limit, ...}} where supported."""
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
