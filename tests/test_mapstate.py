"""Tests for the SoA MapState: insertion, incidence, covisibility, submaps."""

import jax.numpy as jnp
import numpy as np

from rumi_slam_tpu.geometry import lie
from rumi_slam_tpu.mapstate import map_state as M
from rumi_slam_tpu.ops.orb import Features
import pytest

pytestmark = pytest.mark.core

RNG = np.random.default_rng(2)


def fake_feats(F=32, n_valid=None):
    n_valid = F if n_valid is None else n_valid
    return Features(
        uv=jnp.asarray(RNG.uniform(0, 100, (F, 2)).astype(np.float32)),
        response=jnp.ones((F,), jnp.float32),
        angle=jnp.zeros((F,), jnp.float32),
        octave=jnp.zeros((F,), jnp.int32),
        desc=jnp.asarray(RNG.integers(0, 2**32, (F, 8), dtype=np.uint32)),
        valid=jnp.arange(F) < n_valid,
    )


def small_map():
    return M.empty(max_kf=8, max_feat=32, max_pt=128)


class TestInsert:
    def test_insert_keyframe(self):
        ms = small_map()
        f = fake_feats(n_valid=20)
        ms, kid = M.insert_keyframe(
            ms, lie.se3_identity(), f, 1.5, jnp.full((32,), -1, jnp.int32)
        )
        assert int(kid) == 0 and int(ms.n_kf) == 1
        assert bool(ms.kf_valid[0])
        assert float(ms.kf_time[0]) == 1.5
        assert int(ms.kf_map_id[0]) == 0

    def test_insert_full_map_noop(self):
        ms = small_map()
        f = fake_feats()
        for i in range(10):
            ms, kid = M.insert_keyframe(
                ms, lie.se3_identity(), f, float(i), jnp.full((32,), -1, jnp.int32)
            )
        assert int(ms.n_kf) == 8

    def test_add_points_compaction(self):
        ms = small_map()
        xyz = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
        desc = jnp.asarray(RNG.integers(0, 2**32, (16, 8), dtype=np.uint32))
        valid = jnp.asarray([i % 2 == 0 for i in range(16)])
        ms, ids = M.add_points(ms, xyz, desc, valid, 0)
        ids = np.asarray(ids)
        assert (ids[::2] >= 0).all() and (ids[1::2] == -1).all()
        assert int(ms.n_pt) == 8
        # valid rows landed at their slots with correct data
        for row, slot in enumerate(ids):
            if slot >= 0:
                np.testing.assert_allclose(ms.pt_xyz[slot], xyz[row])

    def test_add_points_overflow(self):
        ms = small_map()
        xyz = jnp.zeros((200, 3))
        desc = jnp.zeros((200, 8), jnp.uint32)
        ms, ids = M.add_points(ms, xyz, desc, jnp.ones(200, bool), 0)
        assert int(ms.n_pt) == 128
        assert int(jnp.sum(ms.pt_valid)) == 128


class TestGraph:
    def _two_kf_shared(self, n_shared=20):
        ms = small_map()
        f = fake_feats()
        xyz = jnp.asarray(RNG.normal(size=(32, 3)).astype(np.float32))
        ms, ids = M.add_points(ms, xyz, f.desc, jnp.ones(32, bool), 0)
        assoc1 = jnp.asarray(ids)
        assoc2 = jnp.where(jnp.arange(32) < n_shared, assoc1, -1)
        ms, k1 = M.insert_keyframe(ms, lie.se3_identity(), f, 0.0, assoc1)
        ms, k2 = M.insert_keyframe(ms, lie.se3_identity(), f, 1.0, assoc2)
        return ms

    def test_covisibility_weight(self):
        ms = self._two_kf_shared(20)
        W = M.covisibility(ms)
        assert int(W[0, 1]) == 20 and int(W[1, 0]) == 20
        assert int(W[0, 0]) == 0

    def test_local_window(self):
        ms = self._two_kf_shared(20)
        ids, valid = M.local_window(ms, jnp.int32(0), window=4)
        assert int(ids[0]) == 0
        assert int(ids[1]) == 1 and bool(valid[1])

    def test_point_obs_count(self):
        ms = self._two_kf_shared(20)
        obs = M.point_obs_count(ms)
        assert int(jnp.sum(obs == 2)) == 20
        assert int(jnp.sum(obs == 1)) == 12


class TestSubmaps:
    def test_relabel_merge(self):
        ms = small_map()
        f = fake_feats()
        ms, _ = M.insert_keyframe(ms, lie.se3_identity(), f, 0.0,
                                  jnp.full((32,), -1, jnp.int32), map_id=0)
        ms, _ = M.insert_keyframe(ms, lie.se3_identity(), f, 1.0,
                                  jnp.full((32,), -1, jnp.int32), map_id=1)
        assert int(M.map_kf_count(ms, 0)) == 1
        ms = M.relabel_map(ms, 1, 0)
        assert int(M.map_kf_count(ms, 0)) == 2
        assert int(M.map_kf_count(ms, 1)) == 0

    def test_duration_and_curvature(self):
        ms = small_map()
        f = fake_feats()
        # straight line of 4 KFs
        for i in range(4):
            pose = lie.se3_inverse(
                lie.se3(lie.quat_identity(), jnp.asarray([float(i), 0.0, 0.0]))
            )
            ms, _ = M.insert_keyframe(ms, pose, f, float(i) * 0.5,
                                      jnp.full((32,), -1, jnp.int32))
        assert abs(float(M.map_duration(ms, 0)) - 1.5) < 1e-6
        curv = float(M.map_trajectory_curvature(ms, 0))
        assert abs(curv - 1.0) < 1e-3  # straight: path == chord
