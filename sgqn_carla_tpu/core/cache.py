"""Persistent XLA compilation cache for every CLI entry point.

The fused training-chunk programs (act → step → replay → update scanned
over an episode) take minutes to compile; the cache turns repeat runs of
the same (domain, algorithm, shape) configuration into second-scale
startups. bench.py and tests/conftest.py configure the same directories —
one cache per backend so CPU and TPU artifacts never collide.
"""

from __future__ import annotations

import os


def enable_persistent_cache(subdir: str = ".jax_cache"):
    import jax

    root = os.environ.get(
        "SGQN_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), subdir))
    try:
        jax.config.update("jax_compilation_cache_dir", root)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the flags
        pass
