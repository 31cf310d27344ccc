"""Trajectory export/import: TUM, EuRoC, and KITTI formats.

Reproduces the reference's trajectory savers
(/root/reference/src/rumi-slam/lib_src/System.cc SaveKeyFrameTrajectoryTUM /
CloudSaveKeyFrameTrajectoryTUM / SaveTrajectoryEuRoC /
SaveKeyFrameTrajectoryEuRoC / SaveTrajectoryKITTI, System.h:144-165):

* TUM:   ``timestamp tx ty tz qx qy qz qw`` (seconds, camera-to-world)
* EuRoC: same fields with nanosecond integer timestamps
* KITTI: 12 row-major entries of the 3x4 camera-to-world matrix, no stamps
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..geometry import lie


def save_tum(path, times, poses_cw):
    """poses_cw: [N,7] world->camera (internal convention); written as Twc."""
    import jax

    poses_cw = np.asarray(poses_cw)
    lines = []
    if len(poses_cw):
        import jax.numpy as jnp

        Twc = np.asarray(jax.vmap(lie.se3_inverse)(jnp.asarray(poses_cw)))
        for t, T in zip(np.asarray(times), Twc):
            qw, qx, qy, qz = T[0], T[1], T[2], T[3]
            tx, ty, tz = T[4], T[5], T[6]
            lines.append(
                f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}"
            )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")


def save_euroc(path, times, poses_cw):
    """EuRoC format (reference SaveKeyFrameTrajectoryEuRoC): nanosecond
    timestamps, ``ts tx ty tz qx qy qz qw`` of the camera-to-world pose."""
    import jax
    import jax.numpy as jnp

    poses_cw = np.asarray(poses_cw)
    lines = []
    if len(poses_cw):
        Twc = np.asarray(jax.vmap(lie.se3_inverse)(jnp.asarray(poses_cw)))
        for t, T in zip(np.asarray(times), Twc):
            qw, qx, qy, qz = T[0], T[1], T[2], T[3]
            tx, ty, tz = T[4], T[5], T[6]
            lines.append(
                f"{int(round(t * 1e9))} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}"
            )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")


def save_kitti(path, poses_cw):
    """KITTI format (reference SaveTrajectoryKITTI): per line the 12 row-major
    entries of the 3x4 [R|t] camera-to-world matrix."""
    import jax
    import jax.numpy as jnp

    poses_cw = np.asarray(poses_cw)
    lines = []
    if len(poses_cw):
        Twc = jax.vmap(lie.se3_inverse)(jnp.asarray(poses_cw))
        R = np.asarray(lie.quat_to_matrix(Twc[:, :4]))
        t = np.asarray(Twc[:, 4:7])
        for Ri, ti in zip(R, t):
            M = np.concatenate([Ri, ti[:, None]], axis=1).reshape(-1)
            lines.append(" ".join(f"{v:.9e}" for v in M))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")


def load_tum(path):
    """Returns (times [N], poses_cw [N,7])."""
    import jax
    import jax.numpy as jnp

    times, poses_wc = [], []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        vals = [float(v) for v in line.split()]
        if len(vals) != 8:
            continue
        t, tx, ty, tz, qx, qy, qz, qw = vals
        times.append(t)
        poses_wc.append([qw, qx, qy, qz, tx, ty, tz])
    if not times:
        return np.zeros(0), np.zeros((0, 7))
    Twc = jnp.asarray(poses_wc, jnp.float32)
    Tcw = np.asarray(jax.vmap(lie.se3_inverse)(Twc))
    return np.asarray(times), Tcw
