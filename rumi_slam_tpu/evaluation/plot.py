"""Trajectory/map visualization to PNG (headless).

Stands in for the reference's Pangolin Viewer/MapDrawer thread
(/root/reference/src/rumi-slam/lib_src/{Viewer,MapDrawer}.cc) and the evo
node's traj.png output (scripts/nodes/evo_node.py plot, consumed in
result dirs at cloud_edge_main.cpp:384).  Headless matplotlib; per-submap
coloring mirrors MapDrawer's per-map colored points.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_trajectory(path, times_est, poses_est_cw, times_gt=None,
                    poses_gt_cw=None, *, align=True, title="trajectory"):
    """Top-down (x-z) trajectory plot, optionally with Sim3-aligned GT."""
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..geometry import alignment, lie

    fig, ax = plt.subplots(figsize=(6, 6))
    if len(poses_est_cw):
        c_est = np.asarray(
            lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(np.asarray(poses_est_cw))))
        )
        if poses_gt_cw is not None and len(poses_gt_cw) and align:
            from . import ate as ate_mod

            ie, ig = ate_mod.associate_by_time(times_est, times_gt)
            if len(ie) >= 3:
                c_gt_m = np.asarray(
                    lie.se3_t(jax.vmap(lie.se3_inverse)(
                        jnp.asarray(np.asarray(poses_gt_cw)[ig])))
                )
                S = alignment.umeyama_alignment(
                    jnp.asarray(c_est[ie]), jnp.asarray(c_gt_m))
                c_est = np.asarray(lie.sim3_apply(S, jnp.asarray(c_est)))
        ax.plot(c_est[:, 0], c_est[:, 2], "b-", lw=1.2, label="estimate")
    if poses_gt_cw is not None and len(poses_gt_cw):
        c_gt = np.asarray(
            lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(np.asarray(poses_gt_cw))))
        )
        ax.plot(c_gt[:, 0], c_gt[:, 2], "k--", lw=0.8, label="groundtruth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal", adjustable="datalim")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def draw_frame(path, img, feats, assoc=None, *, state="OK", title=None):
    """Frame overlay with extracted/tracked features — the reference's
    FrameDrawer (FrameDrawer.cc:1-439: green = tracked map points, blue =
    extracted-only keypoints, status bar text)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(img)
    uv = np.asarray(feats.uv)
    valid = np.asarray(feats.valid)
    fig, ax = plt.subplots(figsize=(img.shape[1] / 80, img.shape[0] / 80))
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    if assoc is not None:
        tracked = valid & (np.asarray(assoc) >= 0)
        ax.plot(uv[valid & ~tracked, 0], uv[valid & ~tracked, 1], "b.", ms=2)
        ax.plot(uv[tracked, 0], uv[tracked, 1], "g+", ms=5)
        n_tr = int(tracked.sum())
    else:
        ax.plot(uv[valid, 0], uv[valid, 1], "b.", ms=2)
        n_tr = 0
    ax.set_title(
        title or f"{state} | kp: {int(valid.sum())} tracked: {n_tr}"
    )
    ax.set_axis_off()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)


def plot_covisibility(path, ms, *, min_weight=15, title="covisibility"):
    """KF covisibility-graph drawing (MapDrawer::DrawKeyFrames graph lines:
    edges between KFs sharing >= min_weight points)."""
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..geometry import lie
    from ..mapstate import map_state as M

    fig, ax = plt.subplots(figsize=(6, 6))
    W = np.asarray(M.covisibility(ms))
    kf_ok = np.asarray(ms.kf_valid)
    centers = np.asarray(
        lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(ms.kf_pose)))
    )
    ii, jj = np.nonzero(np.triu(W, 1) >= min_weight)
    for a, b in zip(ii, jj):
        if kf_ok[a] and kf_ok[b]:
            ax.plot(centers[[a, b], 0], centers[[a, b], 2], "g-", lw=0.4,
                    alpha=0.5)
    ax.plot(centers[kf_ok, 0], centers[kf_ok, 2], "r.", ms=4)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.set_aspect("equal", adjustable="datalim")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def plot_map(path, ms, *, title="map"):
    """Top-down map scatter: points colored per submap + KF trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from ..geometry import lie

    fig, ax = plt.subplots(figsize=(6, 6))
    pts = np.asarray(ms.pt_xyz)
    valid = np.asarray(ms.pt_valid)
    mids = np.asarray(ms.pt_map_id)
    for m in np.unique(mids[valid]):
        sel = valid & (mids == m)
        ax.scatter(pts[sel, 0], pts[sel, 2], s=1.0, alpha=0.4, label=f"map {m}")
    kf_ok = np.asarray(ms.kf_valid)
    if kf_ok.any():
        centers = np.asarray(
            lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(ms.kf_pose)))
        )[kf_ok]
        ax.plot(centers[:, 0], centers[:, 2], "r.-", ms=3, lw=0.8, label="KFs")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend(markerscale=4)
    ax.set_aspect("equal", adjustable="datalim")
    if hasattr(path, "write"):          # file-like (LiveViewer streaming)
        fig.savefig(path, dpi=110, bbox_inches="tight", format="png")
    else:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
