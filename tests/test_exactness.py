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
