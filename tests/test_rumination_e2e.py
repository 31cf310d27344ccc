"""Full rumination end-to-end: tracking loss -> back submap -> double merge.

The synthetic fr1_floor-style scenario: a handheld SWEEP trajectory (the
camera pans over one region) with a brief lens-covered span that breaks
tracking; the system must open an edge-back submap, the sampler must
assemble an upload bundle, the backend must reconstruct ACROSS the gap
(welding its own front/back submaps with a PnP-anchored Sim3), and the
double merge must weld everything into one map whose trajectory scores a
finite ATE over BOTH sides of the loss.  The gap length is bounded by
descriptor invariance: past ~0.5 s of this sweep even raw image-to-image
ORB matching decays below RANSAC reach, which no map machinery can undo.
"""

import numpy as np
import pytest

from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.evaluation import ate
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.system import SlamSystem


@pytest.mark.slow
def test_rumination_end_to_end_async():
    """Same scenario driven through the ASYNC rumination shard (the
    reference's non-blocking actionlib flow): the backend build overlaps the
    tracking loop; the merge lands when poll() delivers the CloudMap."""
    import dataclasses
    import time

    from rumi_slam_tpu.rumination.remote import AsyncRuminationShard

    seq = SyntheticSequence(
        n_frames=110, width=320, height=240, n_points=2000, seed=11,
        patch=4, lost_span=(45, 51), trajectory="sweep",
    )
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1)
    )
    slam = SlamSystem(cfg)
    shard = AsyncRuminationShard(cfg)
    coord = RuminationCoordinator(slam, cfg, async_shard=shard)
    try:
        merged = False
        for i in range(len(seq)):
            img, t = seq.frame(i)
            slam.track_monocular(img, t)
            info = coord.maybe_ruminate()
            if info and info.get("result") == "merged":
                merged = True
        # drain: the build may still be in flight when frames run out
        deadline = time.time() + 120
        while not merged and time.time() < deadline:
            info = coord.maybe_ruminate()
            if info and info.get("result") == "merged":
                merged = True
            if info and "failed" in str(info.get("result", "")):
                break
            time.sleep(0.05)
    finally:
        shard.shutdown()

    assert slam.stats["n_new_maps"] >= 1, slam.stats
    assert merged, f"no merge: {coord.history}"
    kt, kp = slam.keyframe_trajectory()
    assert kt.min() < seq.times[40] and kt.max() > seq.times[60]


@pytest.mark.slow
def test_rumination_end_to_end():
    seq = SyntheticSequence(
        n_frames=110, width=320, height=240, n_points=2000, seed=11,
        patch=4, lost_span=(45, 51), trajectory="sweep",
    )
    # a short relocalization window forces genuine LOSS during the shake:
    # with the default 3 s window the PnP relocalizer recovers (the synthetic
    # camera returns to a mapped view), and the rumination path — the subject
    # of this test — never triggers.  The reference's fr1_floor loss events
    # are ones where relocalization genuinely fails (SURVEY.md §3.4).
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1)
    )
    slam = SlamSystem(cfg)
    coord = RuminationCoordinator(slam, cfg)

    merged = False
    for i in range(len(seq)):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
        info = coord.maybe_ruminate()
        if info and info.get("result") == "merged":
            merged = True

    # loss must have occurred and a new submap opened
    assert slam.stats["n_new_maps"] >= 1, slam.stats
    # the rumination must have merged the maps back together
    assert merged, f"no merge: {coord.history}"

    # upload accounting is recorded on the merge row (the STRICT bandwidth
    # assertion lives in test_pd_sampler_engages, whose 3 s degraded gap
    # gives the PD sampler actual flow signal — this 6-frame blank gap
    # legitimately ships the raw fallback)
    m = [h for h in coord.history if h.get("result") == "merged"][0]
    assert "upload_mb" in m and "upload_mb_raw" in m, m
    assert m["upload_mb"] <= m["upload_mb_raw"] + 1e-9, m
    assert m["n_lost_sampled"] <= m["n_lost_raw"], m

    # merged-map KF trajectory must span both sides of the loss and be sane
    kt, kp = slam.keyframe_trajectory()
    assert kt.min() < seq.times[40] and kt.max() > seq.times[60], (
        "merged trajectory does not span the loss gap"
    )
    gt_t = np.asarray(seq.times)
    gt_p = np.stack([np.asarray(p) for p in seq.poses_gt])
    m = ate.evaluate_trajectory(kt, kp, gt_t, gt_p)
    assert np.isfinite(m["ate"])
    assert m["ate"] < 0.3, m


@pytest.mark.slow
def test_pd_sampler_engages():
    """The PD/optical-flow sampler must EARN its upload (VERDICT r4 #2):
    over a >=3 s degraded-but-textured loss gap (blur + contrast collapse —
    the blurred-frames regime the reference's KFDSample works in,
    KFDSample.cc:131-150) the sampler has flow signal, the shipped lost
    list is the PD-selected subsample, and the bundle is STRICTLY smaller
    than the raw no-sampling fallback."""
    import dataclasses

    from rumi_slam_tpu.io.real_trajectory import GroundtruthSequence

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1),
        sampler=dataclasses.replace(cfg.sampler, n_track_last=16,
                                    n_new_track_first=12, min_time_s=0.4,
                                    min_bundle=10),
        mapping=dataclasses.replace(cfg.mapping, max_kf=256, max_pt=12288),
    )
    seq = GroundtruthSequence(
        "rgbd_dataset_freiburg1_floor", duration_s=14.0, seed=100,
        lost_span_s=(8.0, 11.0), gap_mode="degraded")
    slam = SlamSystem(cfg)
    coord = RuminationCoordinator(slam, cfg)
    for i in range(len(seq)):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
        coord.maybe_ruminate()

    rows = [h for h in coord.history if "upload_mb" in h]
    assert rows, f"no bundle was ever assembled: {coord.history}"
    h = rows[0]
    # the 90-frame raw gap must have been PD-subsampled, shipped, and the
    # strict (not vacuous) bandwidth inequality must hold
    assert h["n_lost_sampled"] >= 5, h
    assert h["n_lost_sampled"] < h["n_lost_raw"], h
    assert h["upload_mb"] < 0.7 * h["upload_mb_raw"], (
        "PD sampling did not deliver the >=30% upload cut", h)
    # and the rumination must still conclude in a merge
    assert any(x.get("result") == "merged" for x in coord.history), (
        coord.history)
