"""4-DoF pose graph (reference OptimizeEssentialGraph4DoF, Optimizer.cc:5417)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.geometry import lie
from rumi_slam_tpu.optim import pose_graph as pg


def _chain(n=10, seed=0):
    """Ground-truth camera chain with yaw-only rotations (gravity aligned)."""
    rng = np.random.default_rng(seed)
    Ts = [lie.se3_identity()]
    for k in range(1, n):
        yaw = 0.15 * rng.normal()
        step = jnp.asarray([0.4, 0.0, 0.1 * rng.normal()], jnp.float32)
        T_rel = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.0, yaw])), step)
        Ts.append(lie.se3_compose(T_rel, Ts[-1]))
    return jnp.stack(Ts)


def test_4dof_recovers_from_yaw_drift():
    K = 10
    T_gt = _chain(K)
    # measurements: exact consecutive relatives + a loop edge 0 <-> last
    ii, jj, Tm, w = [], [], [], []
    for a in range(K - 1):
        ii.append(a + 1)
        jj.append(a)
        Tm.append(lie.se3_compose(T_gt[a + 1], lie.se3_inverse(T_gt[a])))
        w.append(1.0)
    ii.append(K - 1)
    jj.append(0)
    Tm.append(lie.se3_compose(T_gt[K - 1], lie.se3_inverse(T_gt[0])))
    w.append(1.0)
    edges = pg.PoseGraphEdgesSE3(
        i=jnp.asarray(ii, jnp.int32), j=jnp.asarray(jj, jnp.int32),
        T_ij=jnp.stack(Tm), weight=jnp.asarray(w, jnp.float32),
    )

    # initial guess: accumulate yaw drift along the chain
    rng = np.random.default_rng(1)
    T0 = [T_gt[0]]
    drift = 0.0
    for a in range(1, K):
        drift += 0.03
        D = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.0, drift])),
                    jnp.asarray(0.05 * rng.normal(size=3), jnp.float32))
        T0.append(lie.se3_compose(D, T_gt[a]))
    T0 = jnp.stack(T0)

    fixed = jnp.zeros(K, bool).at[0].set(True)
    T_opt = pg.optimize_pose_graph_4dof(T0, edges, fixed, n_iters=15)

    def centers(T):
        return np.asarray(lie.se3_t(jax.vmap(lie.se3_inverse)(T)))

    err0 = np.linalg.norm(centers(T0) - centers(T_gt), axis=1).mean()
    err1 = np.linalg.norm(centers(T_opt) - centers(T_gt), axis=1).mean()
    assert err1 < 0.2 * err0
    assert err1 < 0.02


def test_4dof_preserves_roll_pitch():
    """The 4-DoF update must not touch roll/pitch of the initial estimate."""
    K = 4
    T_gt = _chain(K, seed=2)
    # tilt every vertex by a fixed roll; measurements consistent with T_gt
    tilt = lie.so3_exp(jnp.asarray([0.2, 0.0, 0.0]))
    T0 = jnp.stack([
        lie.se3(lie.quat_mul(tilt, T_gt[a, :4]), T_gt[a, 4:7])
        for a in range(K)
    ])
    ii = jnp.asarray([1, 2, 3], jnp.int32)
    jj = jnp.asarray([0, 1, 2], jnp.int32)
    Tm = jnp.stack([
        lie.se3_compose(T0[a + 1], lie.se3_inverse(T0[a])) for a in range(K - 1)
    ])
    edges = pg.PoseGraphEdgesSE3(i=ii, j=jj, T_ij=Tm,
                                 weight=jnp.ones(3, jnp.float32))
    fixed = jnp.zeros(K, bool).at[0].set(True)
    T_opt = pg.optimize_pose_graph_4dof(T0, edges, fixed, n_iters=5)
    # consistent measurements -> no change beyond float noise
    np.testing.assert_allclose(np.asarray(T_opt), np.asarray(T0), atol=1e-4)
