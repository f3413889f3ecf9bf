"""Unit tests for the device-timeline trace parser behind the round-5
roofline correction (tools/device_roofline.py). The parser is the source
of truth for absolute device timings (docs/TUNING.md round 5), so its
event selection — device pid filtering, repeated-kernel grouping,
iteration-period derivation — is pinned here against a synthetic Chrome
trace with known numbers."""

import gzip
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_parser():
    spec = importlib.util.spec_from_file_location(
        "device_roofline", REPO / "tools" / "device_roofline.py")
    mod = importlib.util.module_from_spec(spec)
    # the module inserts repo paths and imports argparse-level deps only at
    # main(); importing it is side-effect-light
    sys.modules["device_roofline"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_trace(tmp_path: Path, events) -> Path:
    tdir = tmp_path / "trace"
    run = tdir / "plugins" / "profile" / "2026_01_01_00_00_00"
    run.mkdir(parents=True)
    payload = {"traceEvents": events}
    with gzip.open(run / "vm.trace.json.gz", "wt") as f:
        json.dump(payload, f)
    return tdir


def _synthetic_events():
    """One host pid (must be ignored) + one TPU pid running a while loop
    containing 3 kernel executions of 4ms each at a 6ms period, plus glue
    fusions of 1ms per iteration."""
    evs = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python (host)"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        # host event that must not leak into device stats
        {"ph": "X", "pid": 1, "tid": 1, "name": "dispatch", "ts": 0,
         "dur": 50_000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "while", "ts": 1_000,
         "dur": 18_000},
    ]
    for i in range(3):
        base = 1_000 + i * 6_000
        evs.append({"ph": "X", "pid": 7, "tid": 1,
                    "name": "custom-call.pallas_roundtrip", "ts": base,
                    "dur": 4_000})
        evs.append({"ph": "X", "pid": 7, "tid": 1,
                    "name": "fusion.loop_carry", "ts": base + 4_200,
                    "dur": 1_000})
    return evs


def test_parse_device_timeline_synthetic(tmp_path):
    mod = _load_parser()
    tdir = _write_trace(tmp_path, _synthetic_events())
    out = mod.parse_device_timeline(tdir)
    assert "error" not in out
    # the repeated largest-median group is the kernel: 4ms each, 3 of them
    assert out["kernel_ms_each"] == 4.0
    assert out["kernel_count"] == 3
    # per-iteration period from kernel start gaps: 6ms
    assert out["iter_period_ms"] == 6.0
    assert out["while_ms"] == 18.0
    # the host's 50ms dispatch must not appear anywhere in device stats
    assert all("dispatch" not in g["name"] for g in out["glue_top"])
    glue = {g["name"]: g["total_ms"] for g in out["glue_top"]}
    assert glue["fusion.loop_carry"] == 3.0


def test_parse_device_timeline_no_device_events(tmp_path):
    mod = _load_parser()
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python (host)"}},
        {"ph": "X", "pid": 1, "tid": 1, "name": "dispatch", "ts": 0,
         "dur": 10},
    ]
    tdir = _write_trace(tmp_path, events)
    out = mod.parse_device_timeline(tdir)
    assert out == {"error": "no device events (host-only trace)"}


def test_parse_device_timeline_missing_trace(tmp_path):
    mod = _load_parser()
    out = mod.parse_device_timeline(tmp_path / "nope")
    assert out == {"error": "no trace produced"}
