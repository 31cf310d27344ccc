"""Trajectory evaluation: ATE RMSE with Sim3 alignment (evo-equivalent).

Reproduces the metric oracle the reference calls over ROS
(/root/reference/src/rumi-slam/scripts/nodes/evo_node.py:182-206 — evo APE
translation RMSE after Sim3 ``align(correct_scale=True)``, plus the
completion-rate metric est-duration / gt-duration).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry import alignment, lie


def associate_by_time(t_est, t_gt, max_dt=0.02):
    """Greedy nearest-timestamp association. Returns (idx_est, idx_gt)."""
    t_est = np.asarray(t_est)
    t_gt = np.asarray(t_gt)
    ie, ig = [], []
    j = 0
    for i, te in enumerate(t_est):
        j = int(np.argmin(np.abs(t_gt - te)))
        if abs(t_gt[j] - te) <= max_dt:
            ie.append(i)
            ig.append(j)
    return np.asarray(ie, np.int64), np.asarray(ig, np.int64)


def ate_rmse(p_est, p_gt, *, with_scale=True, return_errors=False):
    """ATE RMSE after closed-form Sim3 alignment of positions [N,3]."""
    p_est = jnp.asarray(p_est, jnp.float32)
    p_gt = jnp.asarray(p_gt, jnp.float32)
    S = alignment.umeyama_alignment(p_est, p_gt, with_scale=with_scale)
    aligned = lie.sim3_apply(S, p_est)
    err = jnp.linalg.norm(aligned - p_gt, axis=-1)
    rmse = float(jnp.sqrt(jnp.mean(err**2)))
    if return_errors:
        return rmse, np.asarray(err)
    return rmse


def evaluate_trajectory(times_est, poses_est_cw, times_gt, poses_gt_cw,
                        *, max_dt=0.02, with_scale=True):
    """Full evo-style evaluation.

    Args:
      poses_*_cw: [N,7] world->camera; positions are camera centers.
      with_scale: Sim3 alignment (True, the monocular default — evo
        ``correct_scale=True``) vs SE3-only (False, for metric-scale
        stereo/RGB-D evaluation).
    Returns dict(ate, rate, n_matched).
    """
    ie, ig = associate_by_time(times_est, times_gt, max_dt)
    if len(ie) < 3:
        return {"ate": float("inf"), "rate": 0.0, "n_matched": int(len(ie))}
    import jax

    c_est = lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(np.asarray(poses_est_cw)[ie])))
    c_gt = lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(np.asarray(poses_gt_cw)[ig])))
    ate, err = ate_rmse(c_est, c_gt, with_scale=with_scale,
                        return_errors=True)
    dur_est = float(np.asarray(times_est)[ie].max() - np.asarray(times_est)[ie].min())
    dur_gt = float(np.asarray(times_gt).max() - np.asarray(times_gt).min())
    return {
        "ate": ate,
        "rate": dur_est / max(dur_gt, 1e-9),
        "n_matched": int(len(ie)),
        # error-shape diagnostics: a misplaced map branch shows as
        # err_max >> err_p50 (bimodal), pure drift grows smoothly
        "err_p50": float(np.median(err)),
        "err_p90": float(np.quantile(err, 0.9)),
        "err_max": float(np.max(err)),
    }
