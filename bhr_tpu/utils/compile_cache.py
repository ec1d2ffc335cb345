"""Persistent XLA compilation cache for tunneled-TPU sessions.

In this environment TPU compiles go through a remote-compile helper and can
cost 20-60 s per program (first geodesic kernel compile; worse for the
rk4/disk/4K variants). JAX's persistent compilation cache keys serialized
executables by HLO fingerprint, so repeated processes (bench runs, autotune
sweeps, test drives, the driver's compile check) pay each compile once per
machine instead of once per process.

Enabled by default from the entry points (bench.py, app, __graft_entry__);
set BHR_COMPILE_CACHE=0 to disable, or BHR_COMPILE_CACHE=<dir> to relocate.
The cache directory is .jax_cache/ at the repo root (gitignored).
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point jax at the persistent compile cache; returns the dir or None."""
    knob = os.environ.get("BHR_COMPILE_CACHE", "1")
    if knob == "0":
        return None
    if knob not in ("", "1"):
        cache_dir = knob
    else:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # never let cache plumbing break a render
        return None
    return cache_dir
