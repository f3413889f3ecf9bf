"""Multi-chip scaling: mesh setup and sharded embed/extract."""

from stegotpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_embed_frames,
    sharded_extract_frames,
    sharded_roundtrip_step,
)
