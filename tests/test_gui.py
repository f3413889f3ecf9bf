"""GUI smoke tests — skipped when no display is available (headless CI)."""

import queue

import pytest

tk = pytest.importorskip("tkinter")


def _make_root():
    try:
        root = tk.Tk()
        root.withdraw()
        return root
    except tk.TclError:
        pytest.skip("no display available")


def test_gui_constructs_and_switches_modes():
    from stegotpu.gui import StegoApp

    root = _make_root()
    try:
        app = StegoApp(root)
        assert app.delta.get() == 20 and app.coeffs.get() == 10
        for mode in ("extract", "genkey", "embed"):
            app.mode.set(mode)
            app._refresh_fields()
            assert len(app.fields.winfo_children()) > 0
    finally:
        root.destroy()


def test_gui_log_queue_drains():
    from stegotpu.gui import StegoApp

    root = _make_root()
    try:
        app = StegoApp(root)
        app._log("hello from worker", "OK")
        root.update()  # run pending after() callbacks? drain is timed
        app._drain_once_for_test() if hasattr(app, "_drain_once_for_test") else None
        # force one drain cycle
        try:
            while True:
                kind, *rest = app._q.get_nowait()
                if kind == "log":
                    msg, tag = rest
                    assert msg == "hello from worker"
                    break
        except queue.Empty:
            pass
    finally:
        root.destroy()
