"""The on-device exactness check library (stegotpu/ops/exactness.py) —
validated here on the CPU backend (interpret-mode Pallas); tools/tpucheck.py
runs the same code compiled on the real chip and commits TPUCHECK_r04.json."""

from stegotpu.ops.exactness import EXACT_KEYS, quick_exactness_check


def test_quick_exactness_check_passes_on_cpu():
    row = quick_exactness_check()
    assert row["ok"], row
    for k in EXACT_KEYS:
        assert row[k] == 0, (k, row)
    # boundary flips on random covers are expected and recorded, not hidden
    assert "extract_mismatch_cover" in row
