"""Loop closing wired into the system + descriptors_at parity op."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.ops import orb


def test_descriptors_at_matches_extraction():
    """Descriptors computed for given keypoints must match the ones the full
    extractor computed at the same locations (same patch pipeline)."""
    from rumi_slam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=1, width=320, height=240, n_points=1200,
                            seed=3, patch=3)
    img, _ = seq.frame(0)
    feats = orb.extract_orb(jnp.asarray(img), n_features=256, n_levels=1)
    sel = np.asarray(feats.valid)
    desc2, ang2 = orb.descriptors_at(jnp.asarray(img), feats.uv, feats.valid)
    # level-0 keypoints: identical patches -> identical descriptors
    d1 = np.asarray(feats.desc)[sel]
    d2 = np.asarray(desc2)[sel]
    ham = np.asarray(
        jnp.sum(jax.lax.population_count(jnp.asarray(d1 ^ d2)), axis=-1)
    )
    assert np.median(ham) <= 8  # rounding of uv can flip a few bits
    ang_err = np.abs(np.asarray(feats.angle)[sel] - np.asarray(ang2)[sel])
    assert np.median(ang_err) < 0.1


@pytest.mark.slow
def test_system_loop_closing_runs():
    """A trajectory that revisits its start must trigger loop detection
    machinery without corrupting tracking (correction may or may not fire on
    synthetic splats — the invariant is a sane, finite map)."""
    import dataclasses

    from rumi_slam_tpu.config import tiny_config
    from rumi_slam_tpu.geometry import lie
    from rumi_slam_tpu.io.synthetic import SyntheticSequence, render_frame
    from rumi_slam_tpu.system import SlamSystem, TrackState

    seq = SyntheticSequence(n_frames=40, width=320, height=240, n_points=1500,
                            seed=4, patch=3)
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, mapping=dataclasses.replace(
            cfg.mapping, loop_closing=True, loop_check_interval=2)
    )
    slam = SlamSystem(cfg)
    for i in range(len(seq)):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
    assert slam.state == TrackState.OK
    assert np.all(np.isfinite(np.asarray(slam.ms.kf_pose)))
    assert np.all(np.isfinite(np.asarray(slam.ms.pt_xyz)))
