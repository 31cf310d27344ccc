"""Jitted per-frame tracking computations.

TPU-native equivalents of the hot paths in the reference's Tracking thread
(/root/reference/src/rumi-slam/lib_src/Tracking.cc): TrackWithMotionModel
(:2441), TrackReferenceKeyFrame (:2324), TrackLocalMap (:2520,
SearchLocalPoints :2996) — all collapsed onto one primitive:
project-candidate-points -> masked MXU Hamming match -> motion-only BA.

The reference runs two sequential match+optimize passes (motion model, then
local map).  Here a single pass against the WHOLE active submap's points is
affordable because candidate gating is a mask on a batched distance matrix,
not a per-point grid walk; a second, wider pass runs only when the first one
is weak (host decides from `n_inliers`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera, lie
from ..mapstate import map_state as M
from ..ops import matcher
from ..optim import pose_opt


class TrackResult(NamedTuple):
    pose: jnp.ndarray         # [7] refined T_cw
    assoc: jnp.ndarray        # [F] int32 feature -> point id (-1 none)
    n_inliers: jnp.ndarray    # scalar int32
    n_candidates: jnp.ndarray # scalar int32 — visible map points


@partial(jax.jit, static_argnames=("img_w", "img_h", "fused"))
def track_frame(
    ms: M.MapState,
    K,
    feats,
    pose_pred,
    radius,
    *,
    img_w: int,
    img_h: int,
    max_hamming=matcher.TH_HIGH,
    nn_ratio=0.9,
    fused: bool = False,
):
    """Match frame features against the active submap's points around a pose
    prediction, then run motion-only BA.

    ``radius``: projection search window in pixels (scalar; the reference
    widens it per octave — here a single wide gate, the ratio test does the
    rest).
    ``fused``: route the masked Hamming match through the Pallas VMEM kernel
    (ops.pallas_matcher) instead of materializing the [F, P] distance matrix
    in HBM — TPU only; the host facade enables it per backend.
    """
    uv_proj, depth = camera.project_world(K, pose_pred, ms.pt_xyz)
    vis = (
        ms.pt_valid
        & (ms.pt_map_id == ms.active_map)
        & (depth > 0.05)
        & (uv_proj[:, 0] >= 0)
        & (uv_proj[:, 0] < img_w)
        & (uv_proj[:, 1] >= 0)
        & (uv_proj[:, 1] < img_h)
    )

    if fused:
        from ..ops.pallas_matcher import fused_match

        idx, mdist = fused_match(
            feats.desc, ms.pt_desc, feats.uv, uv_proj, radius, feats.valid,
            vis, max_dist=max_hamming, ratio=nn_ratio,
        )
    else:
        mask = matcher.radius_mask(feats.uv, uv_proj, radius)
        dist = matcher.hamming_matrix(feats.desc, ms.pt_desc)  # [F, P]
        idx, mdist = matcher.match(
            dist,
            feats.valid,
            vis,
            mask=mask,
            max_dist=max_hamming,
            ratio=nn_ratio,
        )

    matched = idx >= 0
    X = ms.pt_xyz[jnp.clip(idx, 0)]
    # 3x6 LM schedule: the 4x10 of the reference (Optimizer.cc:723) is built
    # for cold starts; with a motion-model prediction 18 iterations converge
    # identically at half the sequential-latency cost.
    res = pose_opt.pose_optimization(K, pose_pred, X, feats.uv, matched,
                                     n_rounds=3, n_iters=6)
    assoc = jnp.where(matched & res.inliers, idx, -1)

    # visibility bookkeeping for culling (reference MapPoint IncreaseVisible/
    # IncreaseFound ratios, used by MapPointCulling)
    P = ms.max_pt
    found = jnp.zeros((P,), jnp.float32).at[jnp.clip(assoc, 0)].add(
        (assoc >= 0).astype(jnp.float32)
    )
    ms = ms._replace(
        pt_visible=ms.pt_visible + vis.astype(jnp.float32),
        pt_found=ms.pt_found + found,
    )

    return ms, TrackResult(
        pose=res.pose,
        assoc=assoc,
        n_inliers=jnp.sum((assoc >= 0).astype(jnp.int32)),
        n_candidates=jnp.sum(vis.astype(jnp.int32)),
    )


@jax.jit
def track_reference_kf(ms: M.MapState, K, feats, kf_id, pose_init, *,
                       max_hamming=matcher.TH_LOW, nn_ratio=0.8):
    """BoW-free reference-KF tracking: match frame descriptors against ONE
    keyframe's features (no spatial window), use its feature->point
    associations, pose-optimize (reference TrackReferenceKeyFrame,
    Tracking.cc:2324 — BoW bucketing is unnecessary at batched-Hamming speed).
    """
    kf_desc = ms.kf_desc[kf_id]
    kf_assoc = ms.kf_point[kf_id]
    has_pt = kf_assoc >= 0

    dist = matcher.hamming_matrix(feats.desc, kf_desc)
    idx, _ = matcher.match(
        dist, feats.valid, ms.kf_feat_valid[kf_id] & has_pt,
        max_dist=max_hamming, ratio=nn_ratio,
    )
    pt = jnp.where(idx >= 0, kf_assoc[jnp.clip(idx, 0)], -1)

    matched = pt >= 0
    X = ms.pt_xyz[jnp.clip(pt, 0)]
    res = pose_opt.pose_optimization(K, pose_init, X, feats.uv, matched)
    assoc = jnp.where(matched & res.inliers, pt, -1)
    return TrackResult(
        pose=res.pose,
        assoc=assoc,
        n_inliers=jnp.sum((assoc >= 0).astype(jnp.int32)),
        n_candidates=jnp.sum(has_pt.astype(jnp.int32)),
    )


@jax.jit
def relocalize_pnp(key, ms: M.MapState, K, feats, kf_id):
    """Relocalization against one candidate KF WITHOUT a pose prior:
    descriptor match to the KF's point-bearing features, then DLT-RANSAC PnP
    + motion-only BA — the reference's Relocalization body (Tracking.cc:3212:
    SearchByBoW + MLPnPsolver RANSAC + PoseOptimization)."""
    from ..optim import pnp

    kf_desc = ms.kf_desc[kf_id]
    kf_assoc = ms.kf_point[kf_id]
    has_pt = kf_assoc >= 0

    dist = matcher.hamming_matrix(feats.desc, kf_desc)
    idx, _ = matcher.match(
        dist, feats.valid, ms.kf_feat_valid[kf_id] & has_pt,
        max_dist=matcher.TH_LOW, ratio=0.85,
    )
    pt = jnp.where(idx >= 0, kf_assoc[jnp.clip(idx, 0)], -1)
    matched = pt >= 0
    X = ms.pt_xyz[jnp.clip(pt, 0)]
    res = pnp.pnp_ransac(key, K, X, feats.uv, matched)
    assoc = jnp.where(matched & res.inliers, pt, -1)
    return TrackResult(
        pose=res.pose,
        assoc=assoc,
        n_inliers=res.n_inliers,
        n_candidates=jnp.sum(matched.astype(jnp.int32)),
    )


@jax.jit
def relocalization_candidates(ms: M.MapState, feats, *, top_k=3):
    """Descriptor-retrieval relocalization candidates: score every KF by its
    number of strong Hamming matches to the frame (replaces the reference's
    DBoW2 inverted index, KeyFrameDatabase::DetectRelocalizationCandidates).

    Returns (kf_ids [top_k], scores [top_k]).
    """
    # distance of each frame feature to each KF feature: [F, K*F] is too big
    # at full capacity; instead score against per-point distinctive
    # descriptors grouped by KF via the incidence structure.
    dist = matcher.hamming_matrix(feats.desc, ms.pt_desc)  # [F, P]
    strong = (dist < 50.0) & feats.valid[:, None] & ms.pt_valid[None, :]
    per_point = jnp.any(strong, axis=0)  # [P] point has a strong match
    B = M.incidence(ms)  # [K, P]
    score = jnp.sum(B & per_point[None, :], axis=1)  # [K]
    score = score * ms.kf_valid
    vals, ids = jax.lax.top_k(score, top_k)
    return ids, vals
