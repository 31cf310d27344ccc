"""utils: stage timer, memory monitor, leveled logging."""

import io
import time

from rumi_slam_tpu.utils import verbose
from rumi_slam_tpu.utils.profiling import MemoryMonitor, StageTimer
import pytest

pytestmark = pytest.mark.core


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    s = t.stats()
    assert s["a"]["n"] == 2
    assert s["a"]["max_ms"] >= 10.0
    assert "a" in t.report()


def test_memory_monitor():
    with MemoryMonitor(interval_s=0.02) as mon:
        x = bytearray(8 << 20)  # 8 MB
        time.sleep(0.1)
        del x
    assert mon.peak_mb() > 1.0
    assert mon.mean_mb() > 1.0


def test_verbose_levels():
    buf = io.StringIO()
    verbose.set_level("NORMAL")
    verbose.print_mess("shown", verbose.Level.NORMAL, file=buf)
    verbose.print_mess("hidden", verbose.Level.DEBUG, file=buf)
    out = buf.getvalue()
    assert "shown" in out and "hidden" not in out
    verbose.set_level(verbose.Level.QUIET)
    assert verbose.get_level() == verbose.Level.QUIET
