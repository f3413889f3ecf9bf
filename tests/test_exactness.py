"""The on-device exactness check library (stegotpu/ops/exactness.py) —
validated here on the CPU backend (interpret-mode Pallas); tools/tpucheck.py
runs the same code compiled on the real chip and commits TPUCHECK_r05.json."""

import pytest

from stegotpu.ops.exactness import EXACT_KEYS, is_robust, quick_exactness_check


@pytest.mark.parametrize("precision", ["wire", "fast"])
def test_quick_exactness_check_passes_on_cpu(precision):
    row = quick_exactness_check(precision=precision)
    assert row["ok"], row
    assert row["precision"] == precision
    for k in EXACT_KEYS:
        assert row[k] == 0, (k, row)
    # boundary flips on random covers are expected and recorded, not hidden
    assert "extract_mismatch_cover" in row


def test_fast_robust_floor_is_its_config_guard():
    assert is_robust(8, 10, "wire") and not is_robust(8, 10, "fast")
    assert is_robust(12, 10, "fast") and is_robust(20, 10, "fast")
    assert not is_robust(100, 10, "fast")


def test_robust_ceiling_excludes_large_deltas():
    """The r5 on-chip calibration measured the algorithmic clipping tail
    crossing 1e-5 between delta 36 and 40 on uniform-random covers — with
    IDENTICAL error counts in the Pallas kernel and the f32 XLA oracle —
    and Poisson noise makes 32-36 a flaky assert, so the asserted envelope
    stops at 30; larger deltas are recorded, not asserted."""
    for prec in ("wire", "fast"):
        assert is_robust(30, 10, prec)
        assert not is_robust(40, 10, prec)
        assert not is_robust(50, 10, prec)


def test_compressed_content_rows_pass_on_fixed_kernel():
    """The sweep's 'compressed' content mode (mpeg4-round-tripped moving
    cover) must pass cleanly on the shipping kernel at the delta=8 robust
    edge — the content class where the r5 inverse bug lost ~1e-4 BER."""
    import numpy as np

    from stegotpu.ops.exactness import check_config, row_ok

    rows = check_config(4, 480, 720, 10, [8.0], np.random.default_rng(42),
                        content="compressed", verbose=False)
    assert rows[0]["content"] == "compressed"
    assert rows[0]["roundtrip_errors_pallas"] == 0, rows[0]
    assert row_ok(rows[0])


def test_compressed_gate_catches_single_pass_inverse():
    """Sensitivity sentinel: the compressed delta=8 row must FAIL when the
    inverse path is downgraded to the r1-r4 single-pass bf16 — proving the
    sweep row actually guards the bug class it was added for. Runs in a
    subprocess so the downgraded matrices are traced fresh (in-process,
    the jit cache would serve the real kernel's trace)."""
    import subprocess
    import sys

    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import stegotpu.ops.pallas_kernel as pk
_h, _v = pk._horiz_inv2_matrix, pk._vert_expand2_matrix
pk._horiz_inv2_matrix = lambda fast=False: _h(True)
pk._vert_expand2_matrix = lambda s, rn, fast=False: _v(s, rn, True)
from stegotpu.ops.exactness import check_config, row_ok
rows = check_config(4, 480, 720, 10, [8.0], np.random.default_rng(42),
                    content="compressed", verbose=False)
assert rows[0]["roundtrip_errors_pallas"] > 2, rows[0]
assert not row_ok(rows[0])
print("GATE-CATCHES-OLD-KERNEL")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert "GATE-CATCHES-OLD-KERNEL" in out.stdout, (out.stdout, out.stderr)
