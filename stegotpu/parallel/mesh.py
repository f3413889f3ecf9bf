"""Device-mesh scaling for the stego kernels.

The reference is single-process, single-threaded (SURVEY.md §2.5) — there is
no communication layer to port. On TPU the workload is embarrassingly
parallel at two levels, mapped onto a 2-D mesh:

- ``data`` axis: frames of the batch are independent -> frame-axis data
  parallelism (dp);
- ``space`` axis: 8-pixel block *rows* within a frame are independent ->
  spatial sharding (sp) of the H axis, for engaging many chips on a single
  high-resolution stream at low batch.

Payload routing needs no communication: per-slot global bit indices are
statically computable, and because bits are consumed block-row-major, the
(B, C) frame-major payload matrix shards *directly* on ('data', 'space') —
the columns belonging to a height-stripe are contiguous. Each shard embeds
its slice against a global ``bit_offset``; the only collective in the fused
round-trip step is a ``psum`` of the BER error count over the mesh (ICI).

Implemented with ``shard_map`` so the per-device program is exactly the
single-chip kernel — no GSPMD surprises inside the QIM masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stegotpu.config import BLOCK
from stegotpu.ops.qim import embed_frames as _embed_xla, extract_frames as _extract_xla


def _kernel_fns(kernel: str, precision: str = "wire"):
    """Per-shard kernel selection ('xla' default; 'pallas' when the shard
    shapes allow — each device runs the single-chip kernel unchanged).
    precision: config.qim_precision ('fast' binds the Pallas TPU-local
    mode; the XLA kernel is HIGHEST-precision in both modes)."""
    if kernel == "pallas":
        import functools

        from stegotpu.ops.pallas_kernel import (
            embed_frames_pallas,
            extract_frames_pallas,
        )

        if precision == "fast":
            return (functools.partial(embed_frames_pallas, precision="fast"),
                    functools.partial(extract_frames_pallas,
                                      precision="fast"))
        return embed_frames_pallas, extract_frames_pallas
    return _embed_xla, _extract_xla


def _require_default_block(block: int) -> None:
    """The per-shard kernel calls run at the standard 8-px block; a different
    `block` would silently misalign the payload offset arithmetic."""
    if block != BLOCK:
        raise NotImplementedError(
            f"sharded kernels support block={BLOCK} only (got {block})"
        )


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh. Defaults to all devices on 'data'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_space
    devices = devices[: n_data * n_space].reshape(n_data, n_space)
    return Mesh(devices, axis_names=("data", "space"))


def parse_mesh_spec(spec: str) -> tuple[int, int]:
    """Parse a 'data=N,space=M' mesh spec string (the --mesh CLI flag).

    Either axis may be omitted (defaults to 1); bare integers mean
    data-parallel only ('4' == 'data=4').
    """
    n_data, n_space = 1, 1
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, _, v = part.partition("=")
            k = k.strip()
            if k not in ("data", "space"):
                raise ValueError(f"unknown mesh axis {k!r} (use data/space)")
            n = int(v)
        else:
            k, n = "data", int(part)
        if n < 1:
            raise ValueError(f"mesh axis {k} must be >= 1, got {n}")
        if k == "data":
            n_data = n
        else:
            n_space = n
    return n_data, n_space


def product_mesh(spec: str, devices=None) -> Mesh:
    """Build the ('data', 'space') mesh a --mesh flag names, with a clear
    error when the host lacks the devices. devices defaults to all of this
    process's visible devices; pass jax.local_devices() for a per-host
    mesh in multi-process runs."""
    n_data, n_space = parse_mesh_spec(spec)
    devices = list(devices) if devices is not None else jax.devices()
    if n_data * n_space > len(devices):
        plat = devices[0].platform if devices else "none"
        raise ValueError(
            f"mesh {spec!r} needs {n_data * n_space} devices but only "
            f"{len(devices)} are available ({plat}); on CPU, "
            "raise the count with --host-devices N"
        )
    return make_mesh(n_data, n_space, devices)


def _shard_offsets(h_l: int, w_l: int, num_ac: int, n_space: int,
                   block: int):
    """Per-shard payload geometry: (stripe capacity, full-frame capacity)."""
    cap_stripe = (h_l // block) * (w_l // block) * num_ac
    return cap_stripe, cap_stripe * n_space


def _embed_local(frames, payload, total_bits, delta, *, num_ac, n_space, block,
                 kernel="xla", precision="wire"):
    """Per-device embed over a (b_l, h_l, w_l) frame shard.

    Local frame f / stripe si holds global bits
    [(di*b_l + f)*cap_frame + si*cap_stripe, ... + cap_stripe); embed each
    frame with its own global offset via a scan (frames advance by cap_frame
    globally but only cap_stripe locally, so the batched single-offset form
    cannot be used across frames).
    """
    di = jax.lax.axis_index("data")
    si = jax.lax.axis_index("space")
    b_l, h_l, w_l = frames.shape
    cap_stripe, cap_frame = _shard_offsets(h_l, w_l, num_ac, n_space, block)
    embed_fn, _ = _kernel_fns(kernel, precision)

    if n_space == 1:
        # full-frame shards: cap_frame == cap_stripe, so the kernel's
        # internal f*cap stride IS the global stride and one batched call
        # reproduces the per-frame scan bit-for-bit — without discarding
        # the batch amortization the kernels are tuned for (the scan
        # issues b_l single-frame launches)
        return embed_fn(frames, payload, total_bits, delta, num_ac,
                        bit_offset=di * b_l * cap_frame)

    def one(f, _):
        offset = (di * b_l + f) * cap_frame + si * cap_stripe
        stego_f, bpf_f = embed_fn(
            jax.lax.dynamic_slice_in_dim(frames, f, 1, 0),
            jax.lax.dynamic_slice_in_dim(payload, f, 1, 0),
            total_bits, delta, num_ac, bit_offset=offset,
        )
        return f + 1, (stego_f[0], bpf_f[0])

    _, (stego, bpf) = jax.lax.scan(one, 0, None, length=b_l)
    return stego, bpf


def sharded_embed_frames(mesh: Mesh, num_ac: int, block: int = BLOCK,
                         kernel: str = "xla", precision: str = "wire"):
    """Jitted dp x sp sharded embed.

    frames (B, H, W) shard as ('data', 'space', None); payload (B, C) as
    ('data', 'space') — C columns are block-row-major so stripe bits are
    contiguous. B must divide by the 'data' size and H//block by 'space'.
    Returned bpf is the per-(frame, stripe) bit count summed over stripes.
    """
    _require_default_block(block)
    n_space = mesh.shape["space"]

    def _local(frames, payload, total_bits, delta):
        stego, bpf = _embed_local(
            frames, payload, total_bits, delta,
            num_ac=num_ac, n_space=n_space, block=block, kernel=kernel,
            precision=precision,
        )
        bpf = jax.lax.psum(bpf, axis_name="space")
        return stego, bpf

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P("data", "space", None), P("data", "space"), P(), P()),
        out_specs=(P("data", "space", None), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_extract_frames(mesh: Mesh, num_ac: int, block: int = BLOCK,
                           kernel: str = "xla", precision: str = "wire"):
    """Jitted dp x sp sharded extract -> (B, C) bits, purely local compute."""
    _require_default_block(block)
    _, extract_fn = _kernel_fns(kernel, precision)

    def _local(frames, delta):
        return extract_fn(frames, delta, num_ac)

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P("data", "space", None), P()),
        out_specs=P("data", "space"),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_roundtrip_step(mesh: Mesh, num_ac: int, block: int = BLOCK,
                           kernel: str = "xla", precision: str = "wire"):
    """Fused sharded embed -> extract -> global BER: one compiled program.

    This is the framework's "training step" analogue: real dp x sp sharding
    with a psum'd on-device error-count reduction over the mesh as the only
    collective. Returns (stego, bits_per_frame, extracted_bits, total_errors)
    where total_errors counts mismatches on payload-carrying slots only.
    """
    _require_default_block(block)
    n_space = mesh.shape["space"]

    def _local(frames, payload, total_bits, delta):
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index("space")
        b_l, h_l, w_l = frames.shape
        cap_stripe, cap_frame = _shard_offsets(
            h_l, w_l, num_ac, n_space, block
        )
        stego, bpf = _embed_local(
            frames, payload, total_bits, delta,
            num_ac=num_ac, n_space=n_space, block=block, kernel=kernel,
            precision=precision,
        )
        _, extract_fn = _kernel_fns(kernel, precision)
        extracted = extract_fn(stego, delta, num_ac)
        # mask: count errors only on slots that actually carry payload
        col = jnp.arange(cap_stripe, dtype=jnp.int32)[None, :]
        frame_idx = di * b_l + jnp.arange(b_l, dtype=jnp.int32)[:, None]
        slot_global = frame_idx * cap_frame + si * cap_stripe + col
        mask = slot_global < total_bits
        errors = jnp.sum(jnp.where(mask, (extracted != payload).astype(jnp.int32), 0))
        total_errors = jax.lax.psum(
            jax.lax.psum(errors, axis_name="space"), axis_name="data"
        )
        bpf = jax.lax.psum(bpf, axis_name="space")
        return stego, bpf, extracted, total_errors

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P("data", "space", None), P("data", "space"), P(), P()),
        out_specs=(P("data", "space", None), P("data"), P("data", "space"), P()),
        check_vma=False,
    )
    return jax.jit(fn)
