"""Persistent XLA executable cache setup, shared by every entry point.

One helper instead of per-script copies (bench.py, __graft_entry__.py,
scripts/*) so cache-tuning changes cannot drift between them. Works through
the axon tunnel — verified: serialized-executable cache hits skip the
remote compile. The video sub-bench alone costs ~4 min of Mosaic+XLA
compiles cold; with the cache a full bench re-run fits in a 10-minute
budget.
"""

from __future__ import annotations

import os
import sys

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> bool:
    """Point jax at a persistent compilation cache directory.

    Returns True when enabled. Failures (unsupported JAX version,
    read-only FS) are non-fatal but LOUD: a silently-disabled cache makes
    every bench run pay ~4 min of cold compiles with no hint why
    (ADVICE r3)."""
    try:
        import jax

        cache = cache_dir or _DEFAULT_DIR
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return True
    except Exception as e:  # pragma: no cover - env-specific
        print(f"warning: persistent XLA compile cache disabled "
              f"({type(e).__name__}: {e}); expect cold compiles",
              file=sys.stderr)
        return False
