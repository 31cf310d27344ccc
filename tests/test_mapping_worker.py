"""Overlapped local mapping: merge protocol, worker e2e, fusion, compaction.

Covers the reference's LocalMapping-thread behaviors (LocalMapping.cc:62 Run
loop, :649 SearchInNeighbors, KeyFrame::SetBadFlag slot reuse) as re-expressed
by tracking/mapping_worker.py + mapstate.compact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.geometry import lie
from rumi_slam_tpu.mapstate import map_state as M
from rumi_slam_tpu.tracking.mapping_worker import merge_mapping_result


def _seed_state(n_kf=3, n_pt=8, F=16):
    ms = M.empty(8, F, 32)
    rng = np.random.default_rng(0)
    for k in range(n_kf):
        feats_uv = jnp.asarray(rng.uniform(0, 100, (F, 2)).astype(np.float32))

        class Feats:
            uv = feats_uv
            octave = jnp.zeros((F,), jnp.int32)
            angle = jnp.zeros((F,), jnp.float32)
            desc = jnp.asarray(rng.integers(0, 2**31, (F, 8)).astype(np.uint32))
            valid = jnp.ones((F,), bool)

        assoc = jnp.full((F,), -1, jnp.int32)
        ms, _ = M.insert_keyframe(ms, lie.se3_identity(), Feats, float(k), assoc)
    xyz = jnp.asarray(rng.uniform(-1, 1, (n_pt, 3)).astype(np.float32))
    desc = jnp.asarray(rng.integers(0, 2**31, (n_pt, 8)).astype(np.uint32))
    ms, _ = M.add_points(ms, xyz, desc, jnp.ones((n_pt,), bool), 0)
    return ms


def test_merge_mapping_result_three_way():
    snap = _seed_state()

    # worker: moves a pose, culls a point, allocates two points
    mapped = snap._replace(
        kf_pose=snap.kf_pose.at[1, 4].set(9.0),
        pt_valid=snap.pt_valid.at[2].set(False),
    )
    new_xyz = jnp.asarray(np.float32([[5, 5, 5], [6, 6, 6]]))
    mapped, _ = M.add_points(
        mapped, new_xyz, jnp.zeros((2, 8), jnp.uint32), jnp.ones(2, bool), 1
    )
    mapped = mapped._replace(pt_found=mapped.pt_found.at[0].add(2.0))

    # tracker meanwhile: appended KF row 3, bumped visible counters
    cur = snap._replace(
        pt_visible=snap.pt_visible + 1.0,
    )

    class Feats:
        uv = jnp.zeros((snap.max_feat, 2), jnp.float32)
        octave = jnp.zeros((snap.max_feat,), jnp.int32)
        angle = jnp.zeros((snap.max_feat,), jnp.float32)
        desc = jnp.zeros((snap.max_feat, 8), jnp.uint32)
        valid = jnp.ones((snap.max_feat,), bool)

    cur, kid = M.insert_keyframe(
        cur, lie.se3(lie.quat_identity(), jnp.asarray([1.0, 0, 0])),
        Feats, 3.0, jnp.full((snap.max_feat,), -1, jnp.int32),
    )

    out = merge_mapping_result(cur, snap, mapped)
    # worker-owned rows adopt the worker's pose
    assert float(out.kf_pose[1, 4]) == 9.0
    # tracker-appended row survives
    assert bool(out.kf_valid[int(kid)])
    assert float(out.kf_pose[int(kid), 4]) == 1.0
    # point allocation follows the worker
    assert int(out.n_pt) == int(mapped.n_pt)
    assert not bool(out.pt_valid[2])
    # counters merge ADDITIVELY: tracker's +1 visible and worker's +2 found
    assert float(out.pt_visible[0]) == float(snap.pt_visible[0]) + 1.0
    assert float(out.pt_found[0]) == float(snap.pt_found[0]) + 2.0


@pytest.mark.slow
def test_overlapped_mapping_e2e():
    """Worker-threaded mapping tracks the same sequence the sync path does
    (reference 5-thread architecture, SURVEY §2.5)."""
    from rumi_slam_tpu.evaluation import ate as A
    from rumi_slam_tpu.io.synthetic import SyntheticSequence
    from rumi_slam_tpu.system import SlamSystem

    seq = SyntheticSequence(
        n_frames=45, width=320, height=240, n_points=1500, seed=4, patch=3
    )
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, mapping=dataclasses.replace(cfg.mapping, overlapped=True)
    )
    slam = SlamSystem(cfg)
    try:
        ok = 0
        for i in range(len(seq)):
            img, t = seq.frame(i)
            ok += slam.track_monocular(img, t).name == "OK"
        slam.sync_mapping()
        assert ok >= 35, f"only {ok}/45 OK frames"
        ts, ps = slam.trajectory_of_map()
        gt = np.stack([np.asarray(p) for p in seq.poses_gt])
        r = A.evaluate_trajectory(ts, ps, seq.times, gt)
        # looser than the sync-path bound: WHICH frames become keyframes
        # depends on worker timing, so accuracy varies run to run
        assert r["ate"] < 0.25, r
        assert slam.stats["n_kf"] >= 3
    finally:
        slam.mapper.shutdown()


def test_fuse_with_neighbors_merges_duplicates():
    """Two points at the same 3D location observed by covisible KFs fuse
    into one (ORBmatcher::Fuse semantics)."""
    from rumi_slam_tpu.tracking.local_mapping import fuse_with_neighbors

    F = 16
    ms = M.empty(8, F, 32)
    K = jnp.asarray([100.0, 100.0, 50.0, 50.0])
    rng = np.random.default_rng(3)
    X = rng.uniform([-1, -1, 4], [1, 1, 8], (F, 3)).astype(np.float32)
    desc = jnp.asarray(rng.integers(0, 2**31, (F, 8)).astype(np.uint32))

    from rumi_slam_tpu.geometry import camera

    def feats_for(T):
        uv, _ = camera.project_world(K, T, jnp.asarray(X))

        class Feats:
            pass

        f = Feats()
        f.uv = uv
        f.octave = jnp.zeros((F,), jnp.int32)
        f.angle = jnp.zeros((F,), jnp.float32)
        f.desc = desc
        f.valid = jnp.ones((F,), bool)
        return f

    T0 = lie.se3_identity()
    T1 = lie.se3(lie.quat_identity(), jnp.asarray([0.3, 0.0, 0.0]))

    # KF0 observes points 0..F-1 as slots 0..F-1
    ms, ids0 = M.add_points(ms, jnp.asarray(X), desc, jnp.ones(F, bool), 0)
    ms, kf0 = M.insert_keyframe(ms, T0, feats_for(T0), 0.0, ids0)
    # KF1 observes DUPLICATE points (same xyz/desc, new slots)
    ms, ids1 = M.add_points(ms, jnp.asarray(X), desc, jnp.ones(F, bool), 0)
    ms, kf1 = M.insert_keyframe(ms, T1, feats_for(T1), 1.0, ids1)

    before = int(jnp.sum(ms.pt_valid))
    ms2, n_fused = fuse_with_neighbors(ms, K, int(kf1), window=3)
    after = int(jnp.sum(ms2.pt_valid))
    assert int(n_fused) > 0
    assert after < before
    # every fused reference now points at a valid (kept) slot
    kp = np.asarray(ms2.kf_point)
    valid = np.asarray(ms2.pt_valid)
    assert valid[kp[kp >= 0]].all()


def test_compaction_reclaims_slots_and_remaps():
    ms = _seed_state(n_kf=4, n_pt=10)
    # associate kf0 feature 0 -> point 7, kf2 feature 1 -> point 1
    ms = ms._replace(
        kf_point=ms.kf_point.at[0, 0].set(7).at[2, 1].set(1),
        pt_ref_kf=ms.pt_ref_kf.at[7].set(2),
    )
    # kill kf1 and points 0..4
    ms = ms._replace(
        kf_valid=ms.kf_valid.at[1].set(False),
        pt_valid=ms.pt_valid.at[:5].set(False),
    )
    ms2, kf_map, pt_map = M.compact(ms)
    assert int(ms2.n_kf) == 3 and int(ms2.n_pt) == 5
    # slot reuse: next insert lands in the reclaimed row
    assert int(kf_map[2]) == 1  # kf2 moved down past dead kf1
    # remapped references survive
    assert int(ms2.kf_point[int(kf_map[0]), 0]) == int(pt_map[7])
    assert int(ms2.kf_point[int(kf_map[2]), 1]) == -1  # point 1 was culled
    assert int(ms2.pt_ref_kf[int(pt_map[7])]) == int(kf_map[2])
    # times stay sorted (slot order == temporal order invariant)
    t = np.asarray(ms2.kf_time[: int(ms2.n_kf)])
    assert (np.diff(t) >= 0).all()


def test_worker_error_surfaces_and_loop_survives(monkeypatch):
    """A failing mapping round must not wedge the worker (ADVICE r3 medium
    #3): the error re-raises on the tracker side at poll/flush, _busy
    clears, and the SAME worker thread accepts + completes the next task."""
    import jax

    from rumi_slam_tpu.mapstate import map_state as M
    from rumi_slam_tpu.tracking import mapping_worker as MW

    cfg = tiny_config()
    K = cfg.intrinsics()
    worker = MW.MappingWorker(cfg, K)
    ms = M.empty(16, 64, 512)

    real_round = MW.run_mapping_round
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected mapping failure")
        return real_round(*a, **kw)

    monkeypatch.setattr(MW, "run_mapping_round", boom)
    try:
        assert worker.submit(ms, 0, use_stereo=False,
                             key=jax.random.PRNGKey(0), kf_count=1)
        with pytest.raises(RuntimeError, match="mapping worker round"):
            worker.flush(timeout=30.0)
        # the loop must still be alive and idle
        assert worker.idle()
        # second task on a trivial (but valid-shaped) map completes
        assert worker.submit(ms, 0, use_stereo=False,
                             key=jax.random.PRNGKey(1), kf_count=2)
        out = worker.flush(timeout=120.0)
        assert out is not None and calls["n"] == 2
    finally:
        worker.shutdown()


@pytest.mark.slow
def test_long_run_exceeds_capacity_with_compaction():
    """A run whose LOGICAL keyframe count exceeds max_kf keeps tracking:
    culling frees redundant KFs and compaction reuses their slots
    (VERDICT r2 missing #5; reference deletes KFs outright)."""
    from rumi_slam_tpu.io.synthetic import SyntheticSequence
    from rumi_slam_tpu.system import SlamSystem

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping, max_kf=16, max_pt=2048, kf_culling=True,
        ),
        tracking=dataclasses.replace(cfg.tracking, kf_min_interval=1,
                                     kf_tracked_ratio=1.1),
    )
    seq = SyntheticSequence(
        n_frames=70, width=320, height=240, n_points=1500, seed=4, patch=3
    )
    slam = SlamSystem(cfg)
    ok = 0
    for i in range(len(seq)):
        img, t = seq.frame(i)
        ok += slam.track_monocular(img, t).name == "OK"
    # kf_tracked_ratio > 1 forces a KF attempt every frame -> logical KF
    # demand far above 16; the system must stay alive and keep tracking
    assert slam.stats["n_kf"] > 16, slam.stats
    assert slam.stats.get("n_compactions", 0) >= 1, slam.stats
    assert ok >= 50, f"{ok} OK frames"
