"""Test harness configuration.

Tests run on a virtual 8-device CPU platform so multi-chip shardings compile
and execute without TPU hardware (SURVEY §4: multi-host tests via
xla_force_host_platform_device_count).

The container's sitecustomize registers the ``axon`` TPU-tunnel backend and
pins ``jax_platforms="axon,cpu"`` through ``jax.config`` — an env var alone
does not win — so we re-pin the config to cpu here, before any backend is
initialized by test imports.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the scalarized physics programs are large;
# caching makes repeat suite runs fast
_cache = os.environ.get("SGQN_TEST_CACHE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():  # pragma: no cover - defensive
    from jax.extend.backend import clear_backends

    clear_backends()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
