"""Multi-chip and multi-host scaling.

mesh: ('data','space') shard_map kernels for one process's devices.
distributed: jax.distributed global mesh + DCN input-sharding helpers.
dist_pipeline: cooperative multi-process file->file embed/extract (the
CLI's dist-embed / dist-extract).
"""

from stegotpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    product_mesh,
    sharded_embed_frames,
    sharded_extract_frames,
    sharded_roundtrip_step,
)
