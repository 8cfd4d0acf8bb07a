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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
