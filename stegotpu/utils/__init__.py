"""Utilities: compilation cache, profiling helpers."""

from stegotpu.utils.jaxcache import enable_compilation_cache  # noqa: F401
