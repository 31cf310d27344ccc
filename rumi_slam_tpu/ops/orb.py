"""Oriented-BRIEF (ORB-style) feature extraction as one jitted array program.

TPU-native re-design of the reference's ORBextractor
(/root/reference/src/rumi-slam/lib_src/ORBextractor.cc — pyramid :1093, FAST +
quad-tree :726, intensity-centroid orientation, BRIEF descriptors :989-1091).
Differences by design, not omission:

* keypoint spread via bucketed top-k (ops/select.py) instead of the serial
  quad-tree;
* the sampling pattern is generated from a fixed-seed Gaussian (as in the
  BRIEF paper) rather than OpenCV's learned table — descriptors are
  self-consistent within this framework, which is all SLAM needs;
* everything is static-shape: each pyramid level contributes a fixed budget of
  slots, invalid slots carry ``valid=False``.

All level keypoints are reported in level-0 pixel coordinates with their
octave and angle, matching the data the reference's Frame keeps per keypoint.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast, image, select

PATCH_R = 19  # gather radius: covers rotated pattern (|p|<=13 -> 13*sqrt(2)~18.4)
PATTERN_R = 13
N_BITS = 256

_rng = np.random.default_rng(20230817)
_pat = np.clip(
    _rng.normal(scale=PATTERN_R / 2.0, size=(N_BITS, 2, 2)), -PATTERN_R, PATTERN_R
).astype(np.float32)
PATTERN = _pat  # [256, 2(points), 2(y,x)]

# circular mask for the intensity-centroid orientation (radius 15)
_ORI_R = 15
_oy, _ox = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
ORI_MASK = ((_oy**2 + _ox**2) <= _ORI_R**2).astype(np.float32)
ORI_Y = (_oy * ORI_MASK).astype(np.float32)
ORI_X = (_ox * ORI_MASK).astype(np.float32)


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (SoA)."""

    uv: jnp.ndarray        # [N, 2] float32 — (x, y) in level-0 pixels
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    octave: jnp.ndarray    # [N] int32
    desc: jnp.ndarray      # [N, 8] uint32 — 256 packed BRIEF bits
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self):
        return self.uv.shape[0]


def level_budgets(n_features: int, n_levels: int, scale_factor: float):
    """Per-level keypoint budgets proportional to level area (reference
    distributes per-level counts the same way, ORBextractor.cc ctor)."""
    inv = [1.0 / (scale_factor ** (2 * i)) for i in range(n_levels)]
    total = sum(inv)
    raw = [max(8, int(round(n_features * v / total))) for v in inv]
    # fix rounding drift on level 0
    raw[0] += n_features - sum(raw)
    return raw


def _orientation(patches):
    """Intensity-centroid angle per patch [N, P, P] -> [N] radians."""
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(ORI_Y))
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(ORI_X))
    return jnp.arctan2(m01, m10)


def _descriptors(patches, angles):
    """Rotated-BRIEF bits from blurred patches.

    patches: [N, P, P]; angles: [N].  Returns packed [N, 8] uint32.
    """
    pat = jnp.asarray(PATTERN)  # [256, 2, 2] (y, x)
    c, s = jnp.cos(angles), jnp.sin(angles)
    # rotate pattern per keypoint: y' = x*sin + y*cos ; x' = x*cos - y*sin
    py, px = pat[..., 0], pat[..., 1]  # [256, 2]
    ry = px[None] * s[:, None, None] + py[None] * c[:, None, None]  # [N,256,2]
    rx = px[None] * c[:, None, None] - py[None] * s[:, None, None]
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)

    def sample(patch, iy_k, ix_k):
        return patch[iy_k, ix_k]  # [256, 2] advanced indexing -> gather

    vals = jax.vmap(sample)(patches, iy, ix)  # [N, 256, 2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits.reshape(bits.shape[0], 8, 32) << shifts[None, None, :], axis=-1)
    return packed.astype(jnp.uint32)


@partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale_factor", "cell", "k_cell"),
)
def extract_orb(
    img,
    *,
    n_features: int = 1024,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    threshold: float = 20.0,
    min_threshold: float = 7.0,
    cell: int = 32,
    k_cell: int = 5,
) -> Features:
    """Full multi-scale ORB extraction on one image.

    The reference retries weak cells with ``minThFAST`` when ``iniThFAST``
    finds nothing (ORBextractor.cc:726-860); here both thresholds' score maps
    are computed and the strong one is preferred per pixel by adding a large
    bonus — one pass, no data-dependent control flow.
    """
    budgets = level_budgets(n_features, n_levels, scale_factor)
    pyr = image.build_pyramid(img, n_levels, scale_factor)

    uvs, resps, angs, descs, octs, valids = [], [], [], [], [], []
    for lvl in range(n_levels):
        il = pyr[lvl]
        strong = fast.nms3x3(fast.fast_score(il, threshold))
        weak = fast.nms3x3(fast.fast_score(il, min_threshold))
        # prefer strong responses: weak-only corners rank below any strong one
        bonus = 1e6
        score = jnp.where(strong > 0, strong + bonus, weak)
        yx, resp, valid = select.select_keypoints(
            score, budgets[lvl], cell=cell, k_cell=k_cell
        )
        resp = jnp.where(resp > bonus / 2, resp - bonus, resp)
        patches_raw = image.gather_patches(il, yx, PATCH_R)
        angles = _orientation(patches_raw)
        blurred = image.gaussian_blur(il, sigma=2.0, radius=3)
        patches_blur = image.gather_patches(blurred, yx, PATCH_R)
        desc = _descriptors(patches_blur, angles)

        s = scale_factor ** lvl
        uv0 = jnp.stack([yx[:, 1].astype(jnp.float32), yx[:, 0].astype(jnp.float32)], -1) * s
        uvs.append(uv0)
        resps.append(resp)
        angs.append(angles)
        descs.append(desc)
        octs.append(jnp.full((budgets[lvl],), lvl, jnp.int32))
        valids.append(valid)

    return Features(
        uv=jnp.concatenate(uvs, 0),
        response=jnp.concatenate(resps, 0),
        angle=jnp.concatenate(angs, 0),
        octave=jnp.concatenate(octs, 0),
        desc=jnp.concatenate(descs, 0),
        valid=jnp.concatenate(valids, 0),
    )
