"""Inertial subsystem tests: preintegration vs a NumPy reimplementation of
the reference's ImuTypes.cc math, bias-correction identities, and the
visual-inertial optimizers (InertialOptimization / PoseInertialOptimization /
Full-and-LocalInertialBA equivalents)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.inertial import inertial_ba as iba
from rumi_slam_tpu.inertial import preintegration as P


def test_package_import():
    import rumi_slam_tpu.inertial as inertial

    assert hasattr(inertial, "preintegration")
    assert hasattr(inertial, "inertial_ba")


# ---------------------------------------------------------------------------
# NumPy reimplementation of IMU::Preintegrated::IntegrateNewMeasurement
# (reference ImuTypes.cc:184-294), written directly from the C++ equations.
# ---------------------------------------------------------------------------


def _np_hat(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def _np_exp_so3(phi):
    th = np.linalg.norm(phi)
    W = _np_hat(phi)
    if th < 1e-8:
        return np.eye(3) + W
    return (
        np.eye(3)
        + np.sin(th) / th * W
        + (1 - np.cos(th)) / th**2 * (W @ W)
    )


def _np_right_jacobian(phi):
    th2 = float(phi @ phi)
    th = np.sqrt(th2)
    W = _np_hat(phi)
    if th2 < 1e-10:
        return np.eye(3) - 0.5 * W + (1.0 / 6.0) * (W @ W)
    A = (1 - np.cos(th)) / th2
    B = (th - np.sin(th)) / (th2 * th)
    return np.eye(3) - A * W + B * (W @ W)


def np_preintegrate(gyro, acc, dts, bg, ba, gyro_noise, acc_noise,
                    gyro_walk, acc_walk):
    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    JRg = np.zeros((3, 3))
    JVg = np.zeros((3, 3))
    JVa = np.zeros((3, 3))
    JPg = np.zeros((3, 3))
    JPa = np.zeros((3, 3))
    C = np.zeros((9, 9))
    Cw = np.zeros((6, 6))
    T = 0.0
    Ng2, Na2 = gyro_noise**2, acc_noise**2
    for w_m, a_m, h in zip(gyro, acc, dts):
        if h <= 0:
            continue
        w = w_m - bg
        a = a_m - ba
        ah = _np_hat(a)
        dP = dP + dV * h + 0.5 * dR @ a * h * h
        dV = dV + dR @ a * h
        phi = w * h
        Rinc = _np_exp_so3(phi)
        Jr = _np_right_jacobian(phi)
        A = np.eye(9)
        A[0:3, 0:3] = Rinc.T
        A[3:6, 0:3] = -dR @ ah * h
        A[6:9, 0:3] = -0.5 * dR @ ah * h * h
        A[6:9, 3:6] = np.eye(3) * h
        B = np.zeros((9, 6))
        B[0:3, 0:3] = Jr * h
        B[3:6, 3:6] = dR * h
        B[6:9, 3:6] = 0.5 * dR * h * h
        Nga = np.diag([Ng2] * 3 + [Na2] * 3) / h
        C = A @ C @ A.T + B @ Nga @ B.T
        Cw = Cw + np.diag([gyro_walk**2] * 3 + [acc_walk**2] * 3) * h
        JPa = JPa + JVa * h - 0.5 * dR * h * h
        JPg = JPg + JVg * h - 0.5 * dR @ ah @ JRg * h * h
        JVa = JVa - dR * h
        JVg = JVg - dR @ ah @ JRg * h
        JRg = Rinc.T @ JRg - Jr * h
        dR = dR @ Rinc
        T += h
    return dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, Cw, T


def _sample_imu(n=40, seed=0, dt=0.01):
    rng = np.random.default_rng(seed)
    gyro = rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    acc = (rng.normal(scale=1.0, size=(n, 3)) + [0, 0, 9.81]).astype(np.float32)
    dts = np.full(n, dt, np.float32)
    return gyro, acc, dts


def test_preintegrate_vs_numpy():
    gyro, acc, dts = _sample_imu()
    bg = np.array([0.01, -0.02, 0.005], np.float32)
    ba = np.array([0.1, 0.05, -0.08], np.float32)
    kw = dict(gyro_noise=1.7e-3, acc_noise=2.0e-2, gyro_walk=1e-4,
              acc_walk=1e-3)
    pre = P.preintegrate(gyro, acc, dts, P.ImuBias(jnp.asarray(bg), jnp.asarray(ba)),
                         **kw)
    ref = np_preintegrate(gyro.astype(np.float64), acc.astype(np.float64),
                          dts.astype(np.float64), bg, ba, **kw)
    dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, Cw, T = ref
    np.testing.assert_allclose(lie.quat_to_matrix(pre.dq), dR, atol=1e-5)
    np.testing.assert_allclose(pre.dv, dV, atol=1e-4)
    np.testing.assert_allclose(pre.dp, dP, atol=1e-4)
    np.testing.assert_allclose(pre.JRg, JRg, atol=1e-4)
    np.testing.assert_allclose(pre.JVg, JVg, atol=1e-3)
    np.testing.assert_allclose(pre.JVa, JVa, atol=1e-4)
    np.testing.assert_allclose(pre.JPg, JPg, atol=1e-4)
    np.testing.assert_allclose(pre.JPa, JPa, atol=1e-4)
    np.testing.assert_allclose(pre.cov, C, atol=1e-5)
    np.testing.assert_allclose(pre.cov_walk, Cw, atol=1e-8)
    np.testing.assert_allclose(pre.dt, T, atol=1e-6)


def test_padding_rows_ignored():
    gyro, acc, dts = _sample_imu(n=30)
    gyro2 = np.concatenate([gyro, np.full((10, 3), 77.0, np.float32)])
    acc2 = np.concatenate([acc, np.full((10, 3), -55.0, np.float32)])
    dts2 = np.concatenate([dts, np.zeros(10, np.float32)])
    a = P.preintegrate(gyro, acc, dts, P.zero_bias())
    b = P.preintegrate(gyro2, acc2, dts2, P.zero_bias())
    for fa, fb in zip(a[:-1], b[:-1]):
        np.testing.assert_allclose(fa, fb, atol=1e-6)


def test_delta_with_bias_first_order():
    """First-order bias correction must track a re-preintegration at the new
    bias (GetDeltaRotation/Velocity/Position, ImuTypes.cc:296-323)."""
    gyro, acc, dts = _sample_imu(seed=3)
    b0 = P.ImuBias(jnp.asarray([0.01, 0.0, -0.01]), jnp.asarray([0.05, -0.02, 0.0]))
    db = np.array([2e-3, -1e-3, 1.5e-3], np.float32)
    b1 = P.ImuBias(b0.bg + db, b0.ba + 2 * jnp.asarray(db))
    pre0 = P.preintegrate(gyro, acc, dts, b0)
    pre1 = P.preintegrate(gyro, acc, dts, b1)
    dq_c, dv_c, dp_c = P.delta_with_bias(pre0, b1)
    np.testing.assert_allclose(
        lie.quat_to_matrix(dq_c), lie.quat_to_matrix(pre1.dq), atol=5e-5
    )
    np.testing.assert_allclose(dv_c, pre1.dv, atol=5e-4)
    np.testing.assert_allclose(dp_c, pre1.dp, atol=5e-4)


# ---------------------------------------------------------------------------
# Synthetic trajectory simulator (discrete model identical to the
# preintegration update, so residuals vanish at the true states).
# ---------------------------------------------------------------------------


def _simulate(n_kf=6, steps=20, dt=0.005, seed=0, bg=None, ba=None):
    rng = np.random.default_rng(seed)
    g_w = np.array([0.0, 0.0, -9.81])
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba
    q = np.array([1.0, 0, 0, 0])
    p = np.zeros(3)
    v = np.array([0.3, -0.1, 0.05])
    states = [(q.copy(), p.copy(), v.copy())]
    segs = []
    for k in range(n_kf - 1):
        gyro, acc, dts = [], [], []
        for s in range(steps):
            w_b = np.array(
                [0.5 * np.sin(0.1 * (k * steps + s)), 0.3, -0.2]
            )
            a_w = np.array(
                [1.2 * np.cos(0.05 * (k * steps + s)), -0.8, 0.4]
            )
            R = np.asarray(lie.quat_to_matrix(jnp.asarray(q, jnp.float32)),
                           np.float64)
            a_b = R.T @ (a_w - g_w)
            gyro.append(w_b + bg)
            acc.append(a_b + ba)
            dts.append(dt)
            # discrete update matching the preintegration model
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            dq = np.asarray(lie.so3_exp(jnp.asarray(w_b * dt, jnp.float32)))
            q = np.asarray(
                lie.quat_normalize(
                    lie.quat_mul(jnp.asarray(q, jnp.float32), jnp.asarray(dq))
                ),
                np.float64,
            )
        states.append((q.copy(), p.copy(), v.copy()))
        segs.append(
            (np.asarray(gyro, np.float32), np.asarray(acc, np.float32),
             np.asarray(dts, np.float32))
        )
    qs = np.stack([s[0] for s in states]).astype(np.float32)
    ps = np.stack([s[1] for s in states]).astype(np.float32)
    vs = np.stack([s[2] for s in states]).astype(np.float32)
    return qs, ps, vs, segs


def test_inertial_residual_zero_at_truth():
    qs, ps, vs, segs = _simulate(n_kf=3)
    pre = P.preintegrate(*segs[0], P.zero_bias())
    r = P.inertial_residual(
        pre, qs[0], ps[0], vs[0], qs[1], ps[1], vs[1], P.zero_bias()
    )
    assert float(jnp.max(jnp.abs(r))) < 2e-3


def test_inertial_only_optimization_recovers_scale():
    qs, ps, vs, segs = _simulate(n_kf=6)
    pres = iba.stack_preintegrated(
        [P.preintegrate(*s, P.zero_bias()) for s in segs]
    )
    true_scale = 2.5
    res = iba.inertial_only_optimization(
        jnp.asarray(qs), jnp.asarray(ps / true_scale), pres, n_iters=25
    )
    assert abs(float(res.scale) - true_scale) < 0.08 * true_scale
    # recovered gravity direction ~ identity rotation (sim used g along -z)
    np.testing.assert_allclose(
        np.asarray(lie.quat_rotate(res.q_wg, jnp.asarray([0.0, 0, -9.81]))),
        [0, 0, -9.81],
        atol=0.4,
    )
    np.testing.assert_allclose(np.asarray(res.velocities), vs, atol=0.15)


def _vi_observations(K, T_cb, q, p, X_w, noise=0.0, seed=0):
    T_bw = lie.se3_inverse(lie.se3(jnp.asarray(q), jnp.asarray(p)))
    T_cw = lie.se3_compose(T_cb, T_bw)
    pc = lie.se3_apply(T_cw, X_w)
    uv = camera.project(K, pc)
    if noise:
        uv = uv + noise * jax.random.normal(jax.random.PRNGKey(seed), uv.shape)
    return uv, pc[:, 2] > 0.1


def test_pose_inertial_optimization_recovers_pose():
    qs, ps, vs, segs = _simulate(n_kf=2, steps=40)
    pre = P.preintegrate(*segs[0], P.zero_bias())
    K = jnp.asarray([300.0, 300.0, 160.0, 120.0])
    T_cb = lie.se3_identity()
    rng = np.random.default_rng(1)
    X_w = jnp.asarray(
        rng.uniform([-2, -2, 2], [2, 2, 6], size=(60, 3)), jnp.float32
    )
    uv, vis = _vi_observations(K, T_cb, qs[1], ps[1], X_w, noise=0.3)

    # perturb the current state
    q0 = lie.quat_normalize(
        lie.quat_mul(jnp.asarray(qs[1]), lie.so3_exp(jnp.asarray([0.03, -0.02, 0.01])))
    )
    p0 = jnp.asarray(ps[1]) + jnp.asarray([0.05, -0.04, 0.06])
    v0 = jnp.asarray(vs[1]) + jnp.asarray([0.2, 0.1, -0.15])

    res = iba.pose_inertial_optimization(
        K, T_cb, jnp.asarray(qs[0]), jnp.asarray(ps[0]), jnp.asarray(vs[0]),
        pre, q0, p0, v0, P.zero_bias(), X_w, uv, vis, n_iters=12,
    )
    assert float(jnp.linalg.norm(res.p_wb - jnp.asarray(ps[1]))) < 0.02
    assert float(jnp.linalg.norm(res.v - jnp.asarray(vs[1]))) < 0.1
    assert int(res.n_inliers) > 40


def test_visual_inertial_ba_improves_window():
    qs, ps, vs, segs = _simulate(n_kf=4, steps=25)
    pres = iba.stack_preintegrated(
        [P.preintegrate(*s, P.zero_bias()) for s in segs]
    )
    K = jnp.asarray([300.0, 300.0, 160.0, 120.0])
    T_cb = lie.se3_identity()
    rng = np.random.default_rng(2)
    X_w = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 6], size=(50, 3)), jnp.float32)

    N, Pt = 4, 50
    uvs, viss = [], []
    for i in range(N):
        uv, vis = _vi_observations(K, T_cb, qs[i], ps[i], X_w, noise=0.2, seed=i)
        uvs.append(uv)
        viss.append(vis)
    cam_idx = jnp.repeat(jnp.arange(N), Pt)
    pt_idx = jnp.tile(jnp.arange(Pt), N)
    uv = jnp.concatenate(uvs)
    conf = jnp.concatenate(viss).astype(jnp.float32)

    rngj = jax.random.PRNGKey(7)
    dq = 0.02 * jax.random.normal(rngj, (N, 3))
    q0 = jax.vmap(lambda q, d: lie.quat_normalize(lie.quat_mul(q, lie.so3_exp(d))))(
        jnp.asarray(qs), dq.at[0].set(0.0)
    )
    p0 = jnp.asarray(ps) + 0.04 * jax.random.normal(rngj, (N, 3)).at[0].set(0.0)
    # KF 0 is held fixed (kf_free below), so its velocity must start correct
    v0 = jnp.asarray(vs) + 0.1 * jax.random.normal(rngj, (N, 3)).at[0].set(0.0)
    X0 = X_w + 0.05 * jax.random.normal(rngj, X_w.shape)
    kf_free = jnp.asarray([False, True, True, True])

    res = iba.visual_inertial_ba(
        K, T_cb, q0, p0, v0, jnp.zeros((N, 3)), jnp.zeros((N, 3)), pres,
        X0, cam_idx, pt_idx, uv, conf, kf_free, jnp.ones(Pt, bool), n_iters=10,
    )
    err_before = float(jnp.linalg.norm(p0[1:] - jnp.asarray(ps)[1:], axis=-1).mean())
    err_after = float(
        jnp.linalg.norm(res.p_wb[1:] - jnp.asarray(ps)[1:], axis=-1).mean()
    )
    assert err_after < 0.5 * err_before
    assert err_after < 0.02
