"""Persistent XLA compilation cache.

First compile of each (batch, H, W) shape costs tens of seconds on a remote
TPU; the CLI is unusable without caching across processes. Enabled by the CLI
and bench entry points (opt out with STEGOTPU_NO_JAX_CACHE=1).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "stegotpu-jax"
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("STEGOTPU_NO_JAX_CACHE"):
        return
    import jax

    path = cache_dir or _DEFAULT_DIR
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
