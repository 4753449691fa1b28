"""Persistent XLA compilation cache (shared by every entry point).

The 720p inference graph takes minutes to compile through the axon tunnel;
caching compiled executables on disk makes the second run of any CLI / the
app / the bench start in seconds. Disable with TURTLE_COMPILE_CACHE=0 or
point elsewhere with TURTLE_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_persistent_cache(min_compile_secs: float = 5.0) -> None:
    if os.environ.get("TURTLE_COMPILE_CACHE", "1") == "0":
        return
    import jax

    path = os.environ.get("TURTLE_COMPILE_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax or already-frozen config: cache is best-effort
