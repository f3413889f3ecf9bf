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
