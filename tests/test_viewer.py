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
