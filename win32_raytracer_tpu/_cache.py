"""Persistent XLA compilation-cache enablement, shared by every entry
point (bench.py, bench/worker.py, tests/conftest.py, the CLI).

jax reads ``JAX_COMPILATION_CACHE_DIR`` ONCE, at import time — and the
TPU environment's sitecustomize imports jax at interpreter startup,
before any user-code ``os.environ`` write, so an in-process setdefault
is read-too-late and the disk cache silently stays off
(docs/axon_runtime_notes.md #21).  ``jax.config.update`` is the
mechanism that works after preimport.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 0.2) -> str:
    """Turn the persistent compilation cache ON at runtime.

    ``cache_dir`` defaults to $JAX_COMPILATION_CACHE_DIR, then the
    repo-local ``.jax_cache``.  ``min_compile_secs`` low-bounds which
    compiles persist — jax's default ~1s skips exactly the small step
    programs this framework dispatches most, so entry points pass 0.2
    (tests pass 0.0: CI shapes are tiny but recur every run).  An
    explicit prior ``jax.config`` setting is left alone.  Returns the
    directory in effect."""
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or _DEFAULT_DIR)
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return d
