"""Persistent XLA compilation cache for the CLI tools.

The reference hot-reloads shaders per frame (renderer.cpp:634-640); the
TPU analog of that iteration loop is jit recompilation, which costs
20-60 s per static-config change.  The persistent cache makes every
re-run of an already-seen (config, shape) combination start in ~1 s —
the compiled executable is keyed by HLO fingerprint and reloaded from
disk, including across processes and across CPU/TPU backends
(separately keyed).

Call :func:`enable` after importing jax, before the first jit dispatch.
tests/conftest.py applies the same settings for the test suite.
"""
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    import jax
    d = cache_dir or os.environ.get("RENDERER_JIT_CACHE", _DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything: tiny entries and fast compiles included — the
    # frame graph is a handful of large programs, not thousands of tiny
    # ones, so there is no eviction pressure.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
