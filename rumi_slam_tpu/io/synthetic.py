"""Synthetic sequence generator: textured 3D world + camera trajectory.

Stands in for the TUM RGB-D datasets the reference replays
(/root/reference/src/rumi-slam/src/cloud_edge_main.cpp:550 RunTxt): no dataset
download is possible in this environment, so integration tests and benches
render a deterministic synthetic world with exact groundtruth.  The renderer
splats high-contrast square patches at projected world-point locations —
corner-rich imagery that FAST/BRIEF track well.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera, lie


TEX_R = 8  # per-landmark texture half-size (supports patch <= 8).
# Size matters for descriptor realism: BRIEF samples a ~31 px window, and
# when the rendered patch is much smaller than that the descriptor encodes
# the CONSTELLATION of neighboring splats — which shears apart under
# viewpoint change, making cross-view matching (relocalization, the
# rumination weld) unrealistically hard.  Real surfaces carry view-stable
# local texture; bigger per-landmark albedo patches model that.


class SyntheticWorld(NamedTuple):
    xyz: jnp.ndarray        # [M,3] world landmarks
    intensity: jnp.ndarray  # [M] patch brightness
    size: jnp.ndarray       # [M] patch half-size in world units (approx)
    tex: jnp.ndarray        # [M,2*TEX_R+1,2*TEX_R+1] per-landmark albedo


def make_world(n_points=3000, seed=0, box=((-5, -3.5, 1.2), (5, 3.5, 8.0))):
    """Landmark box defaults to a CLOSE-RANGE scene (z 1.2-8), matching the
    TUM fr1 handheld-desk geometry the reference validates on.  Depth
    matters: monocular triangulation error scales with depth²/baseline — a
    deep corridor world (the old z<=18 default) puts median parallax near 1°
    under this trajectory and depth scatter at ±40%, which no amount of BA
    can fix; the close world yields 4-10° and single-digit-percent depths.
    """
    rng = np.random.default_rng(seed)
    lo, hi = np.asarray(box[0]), np.asarray(box[1])
    xyz = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    inten = rng.uniform(60, 255, size=n_points).astype(np.float32)
    size = rng.uniform(0.02, 0.08, size=n_points).astype(np.float32)
    # per-landmark texture: a fixed random albedo pattern each splat carries
    # through every view.  A uniform square (the previous renderer) made all
    # landmarks IDENTICAL — BRIEF bits then encoded only the constellation
    # of neighboring splats, which decays with viewpoint; real surfaces carry
    # local texture that is (approximately) view-stable, and descriptor
    # matching across baselines depends on it.
    t = 2 * TEX_R + 1
    tex = rng.uniform(0.35, 1.0, size=(n_points, t, t)).astype(np.float32)
    return SyntheticWorld(
        jnp.asarray(xyz), jnp.asarray(inten), jnp.asarray(size),
        jnp.asarray(tex),
    )


@partial(jax.jit, static_argnames=("width", "height", "patch"))
def render_frame(world: SyntheticWorld, K, T_cw, *, width=640, height=480, patch=4):
    """Render one grayscale frame [H,W] float32 by splatting square patches."""
    uv, depth = camera.project_world(K, T_cw, world.xyz)
    # perspective patch size in pixels
    px = jnp.clip(world.size * K[0] / jnp.maximum(depth, 0.3), 1.0, float(patch))
    vis = (
        (depth > 0.3)
        & (uv[:, 0] > -8)
        & (uv[:, 0] < width + 8)
        & (uv[:, 1] > -8)
        & (uv[:, 1] < height + 8)
    )
    img = jnp.full((height, width), 40.0, jnp.float32)
    cx = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, width - 1)
    cy = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, height - 1)
    inten = jnp.where(vis, world.intensity, 0.0)
    # nearer (larger) splats drawn as (2r+1)^2 textured squares via
    # max-scatter; each splat's per-landmark albedo pattern is view-stable
    for dy in range(-patch, patch + 1):
        for dx in range(-patch, patch + 1):
            inside = (jnp.abs(dy) <= px) & (jnp.abs(dx) <= px)
            yy = jnp.clip(cy + dy, 0, height - 1)
            xx = jnp.clip(cx + dx, 0, width - 1)
            alb = world.tex[:, dy + TEX_R, dx + TEX_R]
            img = img.at[yy, xx].max(jnp.where(inside, inten * alb, 0.0))
    return img


@partial(jax.jit, static_argnames=("width", "height", "patch"))
def render_depth(world: SyntheticWorld, K, T_cw, *, width=640, height=480,
                 patch=4):
    """Depth map [H,W] float32 (meters; 0 = no return) matching
    :func:`render_frame`'s splats — a synthetic RGB-D sensor for the
    TrackRGBD path (the reference replays TUM depth pngs)."""
    uv, depth = camera.project_world(K, T_cw, world.xyz)
    px = jnp.clip(world.size * K[0] / jnp.maximum(depth, 0.3), 1.0, float(patch))
    vis = (
        (depth > 0.3)
        & (uv[:, 0] > -8) & (uv[:, 0] < width + 8)
        & (uv[:, 1] > -8) & (uv[:, 1] < height + 8)
    )
    z = jnp.where(vis, depth, jnp.inf)
    dmap = jnp.full((height, width), jnp.inf, jnp.float32)
    cx = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, width - 1)
    cy = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, height - 1)
    for dy in range(-patch, patch + 1):
        for dx in range(-patch, patch + 1):
            inside = (jnp.abs(dy) <= px) & (jnp.abs(dx) <= px)
            yy = jnp.clip(cy + dy, 0, height - 1)
            xx = jnp.clip(cx + dx, 0, width - 1)
            dmap = dmap.at[yy, xx].min(jnp.where(inside, z, jnp.inf))
    return jnp.where(jnp.isfinite(dmap), dmap, 0.0)


def sweep_trajectory(n_frames, *, seed=1, amp=(1.6, 0.35, 0.5),
                     yaw_amp=0.22):
    """Handheld SWEEP: the camera oscillates over one region instead of
    advancing — the TUM fr1_floor motion class (pan back and forth over the
    same floor).  This is the trajectory for loss-recovery scenarios: after
    a lost span the camera still faces already-mapped structure, which is
    what makes relocalization / rumination merging geometrically possible
    (an ever-advancing camera leaves its own map behind).
    Returns (poses list of [7] T_cw, times @30fps)."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_frames):
        t = i / 30.0
        pos = np.asarray([
            amp[0] * np.sin(2 * np.pi * 0.06 * t),
            amp[1] * np.sin(2 * np.pi * 0.11 * t + 1.0),
            amp[2] * np.sin(2 * np.pi * 0.035 * t),
        ], np.float32) + rng.normal(scale=0.002, size=3).astype(np.float32)
        yaw = yaw_amp * np.sin(2 * np.pi * 0.05 * t)
        pitch = 0.4 * yaw_amp * np.sin(2 * np.pi * 0.08 * t + 0.7)
        q = lie.so3_exp(jnp.asarray([pitch, yaw, 0.0], np.float32))
        T_wc = lie.se3(q, jnp.asarray(pos))
        poses.append(lie.se3_inverse(T_wc))
    times = np.arange(n_frames, dtype=np.float64) / 30.0
    return poses, times


def smooth_trajectory(n_frames, *, seed=1, speed=0.06, yaw_rate=0.004,
                      sway=0.10, lost_span=None):
    """World->camera poses for a handheld-style forward-moving camera.

    The motion is forward + gentle turn PLUS lateral/vertical sway (the
    oscillation every handheld TUM fr1 trajectory shows).  The sway matters:
    a pure forward dolly is the degenerate case for monocular SLAM — points
    near the focus of expansion have no parallax, triangulated depths are
    weak, and map-based relocalization from a displaced viewpoint fails.

    Args:
      sway: lateral/vertical oscillation amplitude (world units).
      lost_span: kept in the signature for the sequence-level loss event
        (see SyntheticSequence: frames in the span render featureless —
        "lens covered" — while the trajectory continues smoothly, the way
        the reference's fr1_floor loses tracking on textureless views).
    Returns list of [7] T_cw arrays and timestamps (30 fps).
    """
    rng = np.random.default_rng(seed)
    poses = []
    t = np.zeros(3, np.float32)
    yaw = 0.0
    for i in range(n_frames):
        yaw += yaw_rate + rng.normal(scale=0.0005)
        t = t + np.asarray([np.sin(yaw), 0.0, np.cos(yaw)], np.float32) * speed
        # handheld sway: two incommensurate frequencies, lateral + vertical
        ph = i / 30.0 * 2.0 * np.pi
        osc = np.asarray([
            sway * np.sin(0.45 * ph) + 0.3 * sway * np.sin(1.1 * ph + 1.0),
            0.5 * sway * np.sin(0.7 * ph + 0.5),
            0.0,
        ], np.float32)
        wob = rng.normal(scale=0.002, size=3).astype(np.float32)
        q = lie.so3_exp(jnp.asarray([0.0, yaw, 0.0], np.float32) + jnp.asarray(wob))
        T_wc = lie.se3(q, jnp.asarray(t + osc))
        poses.append(lie.se3_inverse(T_wc))
    times = np.arange(n_frames, dtype=np.float64) / 30.0
    return poses, times


class SyntheticSequence:
    """Iterable frame source mirroring the reference's dataset replay."""

    def __init__(self, n_frames=120, *, width=640, height=480, K=None,
                 n_points=3000, seed=0, lost_span=None, patch=4,
                 trajectory="advance"):
        self.world = make_world(n_points, seed=seed)
        self.K = (
            K
            if K is not None
            else jnp.asarray([width * 0.8, width * 0.8, width / 2 - 0.5, height / 2 - 0.5])
        )
        self.width, self.height, self.patch = width, height, patch
        # loss model: frames in lost_span render FEATURELESS while the
        # trajectory continues smoothly — the reference's loss events are
        # textureless/blurred views (fr1_floor), not teleports; the lost
        # frames must remain *reconstructable context* for the rumination
        # backend, which is the whole premise of the paper.
        self.lost_span = lost_span
        if trajectory == "sweep":
            self.poses_gt, self.times = sweep_trajectory(n_frames, seed=seed + 1)
        else:
            self.poses_gt, self.times = smooth_trajectory(n_frames, seed=seed + 1)

    def __len__(self):
        return len(self.poses_gt)

    def _in_lost_span(self, i):
        return self.lost_span is not None and self.lost_span[0] <= i < self.lost_span[1]

    def frame(self, i):
        if self._in_lost_span(i):
            img = jnp.full((self.height, self.width), 40.0, jnp.float32)
        else:
            img = render_frame(
                self.world, self.K, self.poses_gt[i],
                width=self.width, height=self.height, patch=self.patch,
            )
        return img, float(self.times[i])

    def frame_rgbd(self, i):
        """(gray, depth [m], t) — synthetic RGB-D sensor."""
        img, t = self.frame(i)
        depth = render_depth(
            self.world, self.K, self.poses_gt[i],
            width=self.width, height=self.height, patch=self.patch,
        )
        return img, depth, t

    def frame_stereo(self, i, baseline: float):
        """(gray_left, gray_right, t) — synthetic rectified stereo pair with
        the right camera offset by ``baseline`` meters along +x of the left
        camera frame."""
        img_l, t = self.frame(i)
        T_rl = lie.se3(lie.quat_identity(), jnp.asarray([-baseline, 0.0, 0.0]))
        T_rw = lie.se3_compose(T_rl, self.poses_gt[i])
        img_r = render_frame(
            self.world, self.K, T_rw,
            width=self.width, height=self.height, patch=self.patch,
        )
        return img_l, img_r, t
