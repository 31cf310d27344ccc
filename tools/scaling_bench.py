"""Sharded-BA scaling measurement -> SCALING.json.

Measures wall-time per LM iteration of parallel.sharded_ba at 1/2/4/8 mesh
devices on a fixed GLOBAL problem (strong scaling), plus the analytic
per-iteration collective volume.  Run with real chips for true numbers:

    python tools/scaling_bench.py            # whatever backend is live

On this dev box only a 2-core CPU is available, so the 4/8-device rows share
cores and measure SPMD overhead, not speedup — the JSON carries an explicit
``honest_caveat`` for that case.  The collective volume shows WHERE scaling
breaks: the reduced camera system psum is O(C^2) replicated per device and
independent of D, so efficiency falls once per-device residual work
(O(obs/D)) drops below the fixed psum+solve cost — the standard
Schur-sharding wall.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np


def build_problem(n_cams=24, n_pts=4096, seed=0):
    from rumi_slam_tpu.geometry import camera, lie

    rng = np.random.default_rng(seed)
    K = jnp.asarray([200.0, 200.0, 127.5, 95.5])
    X = rng.uniform([-3, -2, 2], [3, 2, 9], (n_pts, 3)).astype(np.float32)
    poses = []
    for i in range(n_cams):
        q = lie.so3_exp(jnp.asarray(rng.normal(scale=0.02, size=3).astype(np.float32)))
        poses.append(np.concatenate([np.asarray(q), np.asarray(
            [0.15 * i, 0.1 * np.sin(i), 0.0], np.float32)]))
    poses = jnp.asarray(np.stack(poses))
    uv = np.zeros((n_cams, n_pts, 2), np.float32)
    for i in range(n_cams):
        p, _ = camera.project_world(K, poses[i], jnp.asarray(X))
        uv[i] = np.asarray(p) + rng.normal(scale=0.5, size=(n_pts, 2))
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    conf = np.ones(n_cams * n_pts, np.float32)
    return K, poses, X, cam_idx, pt_idx, uv.reshape(-1, 2), conf


def run(n_iters=4):
    from jax.sharding import Mesh

    from rumi_slam_tpu.parallel import sharded_ba

    K, poses, X, cam_idx, pt_idx, uv, conf = build_problem()
    n_cams, n_pts = poses.shape[0], X.shape[0]
    n_obs = len(conf)
    devs = jax.devices()
    if len(devs) < 8:
        devs = jax.devices("cpu")
    rows = []
    base = None
    for D in [1, 2, 4, 8]:
        if len(devs) < D:
            break
        mesh = Mesh(np.array(devs[:D]), ("ba",))
        part = sharded_ba.partition_problem(
            cam_idx, pt_idx, uv, conf, n_pts, D)
        Pl = part["pts_per_shard"]
        pts_sh = np.zeros((D, Pl, 3), np.float32)
        for d in range(D):
            ok = part["point_rows"][d] < n_pts
            pts_sh[d, ok] = X[part["point_rows"][d][ok]]
        args = (
            mesh, K, poses,
            jnp.asarray(pts_sh.reshape(D * Pl, 3)),
            jnp.asarray(part["cam_idx"].reshape(-1)),
            jnp.asarray(part["pt_local"].reshape(-1)),
            jnp.asarray(part["uv"].reshape(-1, 2)),
            jnp.asarray(part["conf"].reshape(-1)),
            jnp.asarray([False, False] + [True] * (n_cams - 2)),
        )
        # warm (compile)
        r = sharded_ba.sharded_bundle_adjust(*args, n_iters=n_iters)
        jax.block_until_ready(r[0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = sharded_ba.sharded_bundle_adjust(*args, n_iters=n_iters)
            jax.block_until_ready(r[0])
        dt = (time.perf_counter() - t0) / reps / n_iters
        if base is None:
            base = dt
        rows.append({
            "devices": D,
            "ms_per_iter": round(dt * 1e3, 2),
            "speedup": round(base / dt, 3),
            "efficiency": round(base / dt / D, 3),
            "cost": float(r[2]),
        })
    # analytic per-iteration collective volume (psum of reduced camera
    # system + rhs + 3 scalar costs), independent of D:
    comm_bytes = (n_cams * 6) ** 2 * 4 + n_cams * 6 * 4 + 3 * 4
    out = {
        "metric": "sharded_ba_strong_scaling",
        "backend": jax.default_backend(),
        "problem": {"cams": n_cams, "points": n_pts, "obs": n_obs},
        "psum_bytes_per_iter": comm_bytes,
        "rows": rows,
    }
    if jax.default_backend() == "cpu":
        ncpu = os.cpu_count()
        out["honest_caveat"] = (
            f"virtual CPU mesh on a {ncpu}-core host: rows with devices > "
            f"{ncpu} time-slice cores, so 'efficiency' measures SPMD overhead "
            "only; re-run on a real multi-chip slice for true scaling")
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    run()
