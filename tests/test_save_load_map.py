"""SlamSystem map checkpoint + relocalization resume (reference
System::SaveAtlas/LoadAtlas + localization-mode reuse)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState


@pytest.mark.slow
def test_save_load_relocalize(tmp_path):
    seq = SyntheticSequence(n_frames=25, width=320, height=240,
                            n_points=1500, seed=4, patch=3)
    slam = SlamSystem(tiny_config())
    for i in range(len(seq)):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
    assert slam.state == TrackState.OK
    n_kf = int(slam.ms.n_kf)
    assert n_kf >= 2

    path = slam.save_map(tmp_path / "atlas.npz")

    slam2 = SlamSystem(tiny_config())
    slam2.load_map(path)
    assert int(slam2.ms.n_kf) == n_kf
    assert slam2.state == TrackState.RECENTLY_LOST
    np.testing.assert_allclose(np.asarray(slam2.ms.pt_xyz),
                               np.asarray(slam.ms.pt_xyz))

    # localization-only resume against the loaded map
    slam2.activate_localization_mode()
    img, t = seq.frame(len(seq) - 1)
    st = slam2.track_monocular(img, t + 1.0 / 30.0)
    assert st == TrackState.OK, "relocalization against loaded map failed"
    assert int(slam2.ms.n_kf) == n_kf  # localization mode adds no KFs
