"""Research attic: kernel variants that LOST their benchmarks on real TPU.

Nothing here is on a default import path. Kept because the measurements and
the failure modes are documented knowledge (docs/TUNING.md "Things measured
and rejected"):

- ``pallas_kron``: in-kernel blockify + dense 64x64 Kronecker matmul.
  Mosaic rejects the 4-D lane-splitting blockify reshape on real TPU
  ("unsupported shape cast") — compiled-interpret only. Its flop argument
  was also superseded by the compact/sparse-delta kernels.
- ``qim_fast``: image-layout XLA einsum variant (1,190 fps vs 3,948 pallas
  at batch 16) and the uint8 state-plane builder the round-1 pallas kernel
  consumed (the round-2 kernel derives validity in-kernel instead).
"""
