"""Multi-host (multi-process) scaling: jax.distributed + DCN input sharding.

The reference is a single process (SURVEY.md §2.5); multi-host is a
TPU-build-only capability. The design follows the SURVEY §2.5/§5 comm rows:

- **ICI** carries the only in-step collectives (the psum'd BER/bit-count
  reductions inside ``parallel.mesh``'s shard_map programs) — nothing here
  changes; the same compiled step runs unmodified on a *global* mesh whose
  'data' axis spans processes.
- **DCN** is used only for input sharding: each host decodes ITS OWN
  contiguous slice of the frame batch (frame index range
  ``[pid * B/P, (pid+1) * B/P)``) and the slices are assembled into a
  global array with ``multihost_utils.host_local_array_to_global_array`` —
  no frame pixels ever cross hosts; only the tiny replicated scalars and
  the psum'd error count ride DCN.
- Payload routing still needs no communication: global bit offsets are
  statically computable from the (process, frame, stripe) index exactly as
  in the single-host mesh (mesh.py:_embed_local).

On a real TPU pod, ``initialize()`` with no arguments auto-detects the
coordinator. For CI, the same code path runs as N CPU processes with
virtual devices and Gloo collectives (tests/test_multihost.py spawns two
4-device processes and runs the full sharded round trip across them).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or form) the jax.distributed cluster.

    Call before the first backend touch (jax.devices()). With no arguments
    this auto-detects TPU-pod / cluster environments; with explicit
    arguments it forms an ad-hoc cluster (CI, bare-metal CPU hosts).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(n_data: int | None = None, n_space: int = 1) -> Mesh:
    """('data', 'space') mesh over ALL processes' devices.

    jax.devices() orders devices process-major, so a (n_data, n_space)
    reshape gives every process a contiguous block of 'data' rows — the
    layout the DCN input sharding below assumes.
    """
    from stegotpu.parallel.mesh import make_mesh

    return make_mesh(n_data, n_space, jax.devices())


def host_batch_slice(mesh: Mesh, batch_global: int) -> tuple[int, int]:
    """[start, stop) of the global frame batch THIS host must decode.

    This is the DCN input-sharding contract: host i feeds frames
    [i*B/P, (i+1)*B/P) of each global batch to its local devices; a long
    video scatters over hosts by frame ranges with no pixel traffic
    between them.
    """
    nproc = jax.process_count()
    if batch_global % nproc:
        raise ValueError(
            f"process count {nproc} must divide the global batch {batch_global} "
            f"(pick a batch that is a multiple of {nproc})"
        )
    per = batch_global // nproc
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


def to_global(mesh: Mesh, local, spec: P):
    """Assemble per-host local shards into a global jax.Array."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(local, mesh, spec)


def to_host_local(mesh: Mesh, global_arr, spec: P):
    """Slice a global jax.Array back to this host's local shard (numpy)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(global_arr, mesh, spec)
    )


def multihost_roundtrip(mesh: Mesh, frames_local: np.ndarray,
                        payload_local: np.ndarray, total_bits: int,
                        delta: float, num_ac: int,
                        kernel: str = "xla"):
    """Full sharded embed->extract->global-BER step across processes.

    frames_local: (B_local, H, W) — this host's slice of the global batch
    (see host_batch_slice). payload_local: (B_local, C) matching bit
    columns. Returns (stego_local, extracted_local, bits_per_frame_local,
    total_errors) where *_local are this host's shards and total_errors is
    the globally psum'd payload-slot error count (identical on all hosts).
    """
    from stegotpu.parallel.mesh import sharded_roundtrip_step

    step = sharded_roundtrip_step(mesh, num_ac, kernel=kernel)
    frames_g = to_global(mesh, frames_local, P("data", "space", None))
    payload_g = to_global(mesh, payload_local, P("data", "space"))
    total_g = to_global(mesh, jnp.int32(total_bits), P())
    delta_g = to_global(mesh, jnp.float32(delta), P())
    stego, bpf, extracted, errors = step(frames_g, payload_g, total_g, delta_g)
    stego_l = to_host_local(mesh, stego, P("data", "space", None))
    extracted_l = to_host_local(mesh, extracted, P("data", "space"))
    bpf_l = to_host_local(mesh, bpf, P("data"))
    return stego_l, extracted_l, bpf_l, int(np.asarray(jax.device_get(errors)))


def _dryrun_worker(process_id: int, num_processes: int, port: int,
                   n_space: int) -> None:
    """One CI process of the multi-host dryrun (spawned by the test/CLI).

    Builds the global mesh, feeds only this host's frame slice (generated
    deterministically from the global seed — standing in for 'each host
    decodes its own frame range'), runs the sharded round trip, and
    verifies BER=0 both via the global psum and against the local payload
    shard.
    """
    initialize(f"127.0.0.1:{port}", num_processes, process_id)
    mesh = global_mesh(n_space=n_space)
    n_data = mesh.shape["data"]

    num_ac, delta = 10, 20.0
    b_global, h, w = 2 * n_data, 8 * 2 * n_space, 64
    cap = (h // 8) * (w // 8) * num_ac
    rng = np.random.default_rng(7)  # same global stream on every host
    frames_all = rng.integers(60, 196, (b_global, h, w), dtype=np.uint8)
    payload_all = rng.integers(0, 2, (b_global, cap), dtype=np.uint8)
    total_bits = b_global * cap - 5  # payload ends mid-block on purpose
    lo, hi = host_batch_slice(mesh, b_global)

    stego_l, extracted_l, bpf_l, errors = multihost_roundtrip(
        mesh, frames_all[lo:hi], payload_all[lo:hi], total_bits, delta, num_ac,
    )
    assert errors == 0, f"global BER != 0: {errors} errors"
    # local re-check against the host's own payload shard (masked to the
    # slots that actually carry payload)
    flat = extracted_l.reshape(-1)
    want = payload_all[lo:hi].reshape(-1)
    slot0 = lo * cap
    valid = (np.arange(flat.size) + slot0) < total_bits
    assert (flat[valid] == want[valid]).all(), "local shard mismatch"
    assert bpf_l.sum() == min(total_bits, hi * cap) - slot0
    assert stego_l.shape == (hi - lo, h, w)
    print(f"MULTIHOST_OK pid={process_id}/{num_processes} "
          f"mesh=data:{n_data},space:{n_space} devices={jax.device_count()} "
          f"errors={errors}", flush=True)


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="multi-host dryrun worker (one process of N)")
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--space", type=int, default=1)
    a = ap.parse_args(argv)
    _dryrun_worker(a.process_id, a.num_processes, a.port, a.space)


if __name__ == "__main__":
    main()
