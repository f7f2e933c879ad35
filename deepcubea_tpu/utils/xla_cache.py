"""Persistent XLA compilation cache.

Every CLI invocation traces and compiles the same few programs (the fused
AVI chunk, the BWAS step, the GBFS evaluator); without a persistent cache a
fresh process repays the full XLA compile — measured at 329 s for one solve
configuration in round 1 (BENCH_r01.json). Pointing
`jax_compilation_cache_dir` at a stable on-disk directory makes every
subsequent process with an identical (program, shapes, flags) key load the
compiled executable in seconds.

Enabled automatically on package import (deepcubea_tpu/__init__.py); opt
out with DCA_NO_CACHE=1 or redirect with DCA_CACHE_DIR=<path>.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/deepcubea_tpu/xla")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default ~/.cache/deepcubea_tpu/xla, override via DCA_CACHE_DIR)."""
    global _enabled
    if _enabled or os.environ.get("DCA_NO_CACHE"):
        return None
    path = path or os.environ.get("DCA_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax
        # CPU-backend runs (tests, dryruns) skip the cache: XLA:CPU AOT
        # reloads are machine-feature-pinned and warn of SIGILL on
        # mismatch; CPU compiles here are small anyway. The TPU programs
        # are the minutes-long compiles the cache exists for.
        if "cpu" in str(jax.config.jax_platforms or "").lower():
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took a nontrivial compile; the big search /
        # train programs are minutes each, so 1 s is a conservative floor
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None  # older jax without the knobs: cache is best-effort
    _enabled = True
    return path
