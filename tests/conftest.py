"""Test harness config: hermetic 8-device CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) — the idiomatic JAX replacement for
multi-node test clusters (the reference has no distributed tests at all;
SURVEY.md §4).
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel (and /root/.axon_site re-pins the env var, so the env route is not
# enough — jax.config.update is authoritative); tests must be hermetic and
# run the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fast suite's wall time is ~90%
# CPU compiles of big train-step graphs (VERDICT r3 #9); cached repeat
# runs cut it severalfold. Safe across pytest-xdist workers (the cache
# is content-addressed files + atomic rename). Set WESEP_TPU_NO_JAX_CACHE=1
# to measure cold-compile times.
if not os.environ.get("WESEP_TPU_NO_JAX_CACHE"):
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # subprocess-based tests (multihost workers) opt in via this env
    os.environ["WESEP_TEST_JAX_CACHE"] = _cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jit every flax Module.init in tests: eager init dispatches thousands
# of tiny CPU ops (DPCCN: 26 s eager vs ~5 s traced+cached; CAMPPlus'
# 52 dense layers similar) and is the single largest fast-suite cost
# after XLA compiles. init is pure, so jit is semantically identical;
# non-array args fall back to eager. Product code already jits its own
# init (train/trainer.init_train_state).
import numpy as _np  # noqa: E402

import flax.linen as _fnn  # noqa: E402

_eager_init = _fnn.Module.init


def _jitted_init(self, rngs, *args, **kwargs):
    def _is_arr(v):
        return isinstance(v, (jax.Array, _np.ndarray))

    if not all(_is_arr(a) for a in args):
        return _eager_init(self, rngs, *args, **kwargs)
    static = tuple(k for k, v in kwargs.items() if not _is_arr(v))
    try:
        return jax.jit(
            lambda rngs, *a, **kw: _eager_init(self, rngs, *a, **kw),
            static_argnames=static,
        )(rngs, *args, **kwargs)
    except Exception:
        return _eager_init(self, rngs, *args, **kwargs)


_fnn.Module.init = _jitted_init


# Cross-worker serialization of subprocess-spawning tests. The old
# mechanism was xdist_group("subproc") + --dist loadgroup, which pins
# the whole group to ONE worker and (r5 measurement) leaves a serial
# tail that binds the suite wall clock; --dist worksteal rebalances
# stragglers (-18% wall) but ignores groups. This flock keeps the
# group's guarantee — at most one subprocess-heavy test at a time on
# the 4-core harness — under any scheduler.
import fcntl  # noqa: E402
import tempfile  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _serialize_subproc_tests(request):
    marker = request.node.get_closest_marker("xdist_group")
    if not marker or "subproc" not in (marker.args or ()):
        yield
        return
    path = os.path.join(tempfile.gettempdir(), "wesep_subproc_tests.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)
