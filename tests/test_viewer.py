"""Background viewer thread (reference Viewer::Run parity)."""

import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("matplotlib")
import jax.numpy as jnp

from rumi_slam_tpu.evaluation.viewer import MapViewer
from rumi_slam_tpu.mapstate import map_state as M


class _FakeSlam:
    def __init__(self):
        ms = M.empty(8, 16, 64)
        rng = np.random.default_rng(0)
        ms = ms._replace(
            kf_valid=ms.kf_valid.at[:3].set(True),
            kf_map_id=ms.kf_map_id.at[:3].set(0),
            n_kf=jnp.int32(3),
            pt_xyz=jnp.asarray(rng.normal(size=(64, 3)), jnp.float32),
            pt_valid=jnp.ones(64, bool),
            pt_map_id=jnp.zeros(64, jnp.int32),
        )
        self.ms = ms


def test_viewer_snapshots(tmp_path):
    slam = _FakeSlam()
    v = MapViewer(slam, tmp_path, period_s=0.15).start()
    time.sleep(0.6)
    v.stop()
    pngs = list(tmp_path.glob("map_*.png"))
    assert len(pngs) >= 2
    assert all(p.stat().st_size > 1000 for p in pngs)


def test_live_viewer_http(tmp_path):
    import enum
    import json
    import urllib.request

    from rumi_slam_tpu.evaluation.viewer import LiveViewer

    class _S(enum.Enum):
        OK = 1

    slam = _FakeSlam()
    slam.stats = {"n_kf": 3}
    slam.state = _S.OK
    v = LiveViewer(slam, port=18642, period_s=0.2).start()
    try:
        html = urllib.request.urlopen(
            "http://127.0.0.1:18642/", timeout=10).read()
        assert b"rumi_slam_tpu live" in html
        stats = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18642/stats", timeout=10).read())
        assert stats["n_kf"] == 3 and stats["state"] == "OK"
        png = urllib.request.urlopen(
            "http://127.0.0.1:18642/map.png", timeout=30).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 1000
    finally:
        v.stop()
