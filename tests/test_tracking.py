"""Tests for per-frame tracking and local mapping on constructed MapStates."""

import jax
import jax.numpy as jnp
import numpy as np

from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.mapstate import map_state as M
from rumi_slam_tpu.ops.orb import Features
from rumi_slam_tpu.tracking import local_mapping, tracker

RNG = np.random.default_rng(21)
K = jnp.asarray([260.0, 260.0, 159.5, 119.5])
W, H = 320, 240


def random_desc(n):
    return jnp.asarray(RNG.integers(0, 2**32, (n, 8), dtype=np.uint32))


def build_map_with_points(n_pts=200, F=64):
    """MapState with one KF at origin observing n_pts random points."""
    ms = M.empty(max_kf=16, max_feat=F, max_pt=1024)
    X = jnp.asarray(RNG.uniform([-2, -1.5, 3], [2, 1.5, 8], (n_pts, 3)).astype(np.float32))
    desc = random_desc(n_pts)
    ms, ids = M.add_points(ms, X, desc, jnp.ones(n_pts, bool), 0)
    T0 = lie.se3_identity()
    uv0, _ = camera.project_world(K, T0, X)
    feats = Features(
        uv=jnp.zeros((F, 2)).at[: min(F, n_pts)].set(uv0[: min(F, n_pts)]),
        response=jnp.ones(F),
        angle=jnp.zeros(F),
        octave=jnp.zeros(F, jnp.int32),
        desc=jnp.zeros((F, 8), jnp.uint32).at[: min(F, n_pts)].set(desc[: min(F, n_pts)]),
        valid=jnp.arange(F) < min(F, n_pts),
    )
    assoc = jnp.where(jnp.arange(F) < min(F, n_pts), ids[:F], -1)
    ms, kf0 = M.insert_keyframe(ms, T0, feats, 0.0, assoc)
    return ms, X, desc


class TestTrackFrame:
    def test_tracks_from_prediction(self):
        ms, X, desc = build_map_with_points()
        F = 64
        true_pose = lie.se3(
            lie.so3_exp(jnp.asarray([0.0, 0.02, 0.0])), jnp.asarray([0.05, 0.0, 0.02])
        )
        uv, depth = camera.project_world(K, true_pose, X[:F])
        feats = Features(
            uv=uv, response=jnp.ones(F), angle=jnp.zeros(F),
            octave=jnp.zeros(F, jnp.int32), desc=desc[:F], valid=jnp.ones(F, bool),
        )
        # predict with a small pose error
        pred = lie.se3_retract(true_pose, jnp.asarray([0.005, -0.005, 0.0, 0.01, 0.01, -0.01]))
        ms2, tr = tracker.track_frame(
            ms, K, feats, pred, 20.0, img_w=W, img_h=H
        )
        assert int(tr.n_inliers) > 40
        e = lie.se3_log(lie.se3_compose(tr.pose, lie.se3_inverse(true_pose)))
        assert float(jnp.linalg.norm(e)) < 5e-3

    def test_no_match_when_far(self):
        ms, X, desc = build_map_with_points()
        F = 64
        feats = Features(
            uv=jnp.asarray(RNG.uniform(0, 200, (F, 2)).astype(np.float32)),
            response=jnp.ones(F), angle=jnp.zeros(F),
            octave=jnp.zeros(F, jnp.int32), desc=random_desc(F),
            valid=jnp.ones(F, bool),
        )
        pred = lie.se3_identity()
        ms2, tr = tracker.track_frame(ms, K, feats, pred, 10.0, img_w=W, img_h=H)
        assert int(tr.n_inliers) < 10


class TestReferenceKF:
    def test_track_reference(self):
        ms, X, desc = build_map_with_points()
        F = 64
        true_pose = lie.se3(lie.quat_identity(), jnp.asarray([0.1, 0.0, 0.0]))
        uv, _ = camera.project_world(K, true_pose, X[:F])
        feats = Features(
            uv=uv, response=jnp.ones(F), angle=jnp.zeros(F),
            octave=jnp.zeros(F, jnp.int32), desc=desc[:F], valid=jnp.ones(F, bool),
        )
        tr = tracker.track_reference_kf(
            ms, K, feats, jnp.int32(0), lie.se3_identity()
        )
        assert int(tr.n_inliers) > 40
        e = lie.se3_log(lie.se3_compose(tr.pose, lie.se3_inverse(true_pose)))
        assert float(jnp.linalg.norm(e)) < 5e-3

    def test_reloc_candidates(self):
        ms, X, desc = build_map_with_points()
        F = 64
        feats = Features(
            uv=jnp.zeros((F, 2)), response=jnp.ones(F), angle=jnp.zeros(F),
            octave=jnp.zeros(F, jnp.int32), desc=desc[:F], valid=jnp.ones(F, bool),
        )
        ids, scores = tracker.relocalization_candidates(ms, feats)
        assert int(ids[0]) == 0
        assert int(scores[0]) > 30


class TestLocalMapping:
    def test_triangulate_new_points(self):
        F = 96
        ms = M.empty(max_kf=8, max_feat=F, max_pt=512)
        X = jnp.asarray(RNG.uniform([-2, -1.5, 3], [2, 1.5, 8], (F, 3)).astype(np.float32))
        desc = random_desc(F)
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.03, 0.0])), jnp.asarray([-0.3, 0.0, 0.0]))
        uv1, _ = camera.project_world(K, T1, X)
        uv2, _ = camera.project_world(K, T2, X)

        def mk(uv):
            return Features(uv=uv, response=jnp.ones(F), angle=jnp.zeros(F),
                            octave=jnp.zeros(F, jnp.int32), desc=desc,
                            valid=jnp.ones(F, bool))

        none = jnp.full((F,), -1, jnp.int32)
        ms, k1 = M.insert_keyframe(ms, T1, mk(uv1), 0.0, none)
        ms, k2 = M.insert_keyframe(ms, T2, mk(uv2), 0.1, none)
        ms, n_new = local_mapping.triangulate_with_neighbor(ms, K, k2, k1)
        assert int(n_new) > 50
        # triangulated points close to truth
        pt_ids = np.asarray(ms.kf_point[1])
        good = pt_ids >= 0
        est = np.asarray(ms.pt_xyz)[pt_ids[good]]
        err = np.linalg.norm(est - np.asarray(X)[good], axis=-1)
        assert np.median(err) < 0.05

    def test_local_ba_reduces_error(self):
        F = 96
        ms = M.empty(max_kf=8, max_feat=F, max_pt=512)
        X = jnp.asarray(RNG.uniform([-2, -1.5, 3], [2, 1.5, 8], (F, 3)).astype(np.float32))
        desc = random_desc(F)
        poses = [
            lie.se3_identity(),
            lie.se3(lie.quat_identity(), jnp.asarray([-0.2, 0.0, 0.0])),
            lie.se3(lie.quat_identity(), jnp.asarray([-0.4, 0.0, 0.0])),
        ]
        ms, ids = M.add_points(ms, X, desc, jnp.ones(F, bool), 0)
        for i, T in enumerate(poses):
            uv, _ = camera.project_world(K, T, X)
            f = Features(uv=uv, response=jnp.ones(F), angle=jnp.zeros(F),
                         octave=jnp.zeros(F, jnp.int32), desc=desc,
                         valid=jnp.ones(F, bool))
            # perturb the last pose
            Tn = T if i < 2 else lie.se3_retract(T, jnp.asarray([0.01, 0.0, -0.01, 0.03, 0.02, 0.0]))
            ms, _ = M.insert_keyframe(ms, Tn, f, float(i), ids)
        ms2 = local_mapping.local_bundle_adjustment(ms, K, jnp.int32(2), window=3, n_iters=6)
        e = lie.se3_log(lie.se3_compose(ms2.kf_pose[2], lie.se3_inverse(poses[2])))
        assert float(jnp.linalg.norm(e)) < 5e-3

    def test_cull_points(self):
        ms, X, desc = build_map_with_points()
        # make half the points look bad: visible often, never found
        ms = ms._replace(
            pt_visible=ms.pt_visible.at[:100].set(20.0),
            pt_found=ms.pt_found.at[:100].set(1.0),
        )
        ms2 = local_mapping.cull_points(ms, min_obs=1)
        assert int(jnp.sum(ms2.pt_valid)) < int(jnp.sum(ms.pt_valid))


class TestCovisGroupRetrieval:
    def test_aliased_place_resolved_by_group_score(self):
        """Perceptual aliasing (VERDICT r3 missing #6): three covisible KFs
        each half-see the true place; a single alias KF carries MORE
        individually-matching points than any one of them.  Individual
        scoring ranks the alias first; covisibility-group accumulation
        (KeyFrameDatabase::DetectNBestCandidates) must rank the true
        region's group first."""
        rng = np.random.default_rng(9)
        ms = M.empty(8, 32, 128)

        place_desc = rng.integers(0, 2**32, (30, 8), dtype=np.uint32)
        backgr_desc = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
        alias_desc = place_desc[:12].copy()     # same appearance, elsewhere

        pt_desc = np.asarray(ms.pt_desc).copy()
        pt_desc[0:30] = place_desc
        pt_desc[30:50] = backgr_desc
        pt_desc[50:62] = alias_desc
        pt_valid = np.zeros(128, bool)
        pt_valid[:62] = True

        kf_point = np.full((8, 32), -1, np.int32)
        # KFs 0/1/2: 10 distinct place points each + all 20 background
        # points (the shared structure that makes them covisible, >=15)
        for k in range(3):
            kf_point[k, :10] = np.arange(10) + 10 * k
            kf_point[k, 10:30] = np.arange(30, 50)
        # KF 3: the alias — observes 12 points that LOOK like the place
        kf_point[3, :12] = np.arange(50, 62)

        kf_valid = np.zeros(8, bool)
        kf_valid[:4] = True
        ms = ms._replace(
            pt_desc=jnp.asarray(pt_desc), pt_valid=jnp.asarray(pt_valid),
            kf_point=jnp.asarray(kf_point), kf_valid=jnp.asarray(kf_valid),
            n_kf=jnp.int32(4), n_pt=jnp.int32(62),
        )

        F = 32
        fdesc = np.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint32))
        fdesc[:30] = place_desc               # query sees the whole place
        feats = Features(
            uv=jnp.zeros((F, 2)), response=jnp.zeros(F),
            angle=jnp.zeros(F), octave=jnp.zeros(F, jnp.int32),
            desc=jnp.asarray(fdesc), valid=jnp.ones(F, bool),
        )

        # sanity: individually the alias KF outscores any single true KF
        dist = __import__("rumi_slam_tpu.ops.matcher", fromlist=["m"]
                          ).hamming_matrix(feats.desc, ms.pt_desc)
        strong = np.asarray((dist < 50.0) & feats.valid[:, None]
                            & ms.pt_valid[None, :]).any(0)
        indiv = [(strong[kf_point[k][kf_point[k] >= 0]]).sum()
                 for k in range(4)]
        assert indiv[3] > max(indiv[:3]), indiv

        ids, scores = tracker.relocalization_candidates(ms, feats)
        assert int(ids[0]) in (0, 1, 2), (
            f"group scoring must beat the alias: top={int(ids[0])}, "
            f"indiv={indiv}, scores={np.asarray(scores)}")
