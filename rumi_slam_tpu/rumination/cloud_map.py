"""CloudMap: the back-submap exchange contract (poses+keypoints+points+obs).

Tensor equivalent of the reference's ROS ``CloudMap.msg`` family
(/root/reference/src/rumi-slam/msg/{CloudMap,KeyFrame,MapPoint,Observation,
KeyPoint}.msg, codec at src/cloud_edge_main.cpp:789-1007): keyframes carry
pose/stamp/keypoints and a feature->point index; points carry positions.  The
reference ships NO descriptors in this message (fake zeros,
cloud_edge_main.cpp:884,936) — the merge path must work from timestamps and
pixel positions alone, and ours does; descriptors are carried as an optional
extra so merged cloud KFs remain matchable afterwards (an improvement the
reference approximates with ComputeDistinctiveDescriptors over fakes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..mapstate import map_state as M


class CloudMap(NamedTuple):
    kf_pose: jnp.ndarray    # [Kc,7] T_cw (cloud-world frame)
    kf_time: jnp.ndarray    # [Kc]
    kf_uv: jnp.ndarray      # [Kc,F,2]
    kf_octave: jnp.ndarray  # [Kc,F]
    kf_point: jnp.ndarray   # [Kc,F] -> cloud point row, -1
    kf_valid: jnp.ndarray   # [Kc]
    kf_feat_valid: jnp.ndarray  # [Kc,F]
    pt_xyz: jnp.ndarray     # [Pc,3]
    pt_valid: jnp.ndarray   # [Pc]
    kf_desc: Optional[jnp.ndarray] = None  # [Kc,F,8] uint32 (optional extra)
    kf_angle: Optional[jnp.ndarray] = None


def from_map_state(ms: M.MapState, map_id) -> CloudMap:
    """Export one submap of a MapState as a CloudMap (the backend's output
    contract — reference bridge scripts
    scripts/utils/test_export_dvoid_output_to_rosmsg_new.py:41-70)."""
    kf_sel = ms.kf_valid & (ms.kf_map_id == map_id)
    pt_sel = ms.pt_valid & (ms.pt_map_id == map_id)
    # keep global row indexing; mask out non-members
    return CloudMap(
        kf_pose=ms.kf_pose,
        kf_time=ms.kf_time,
        kf_uv=ms.kf_uv,
        kf_octave=ms.kf_octave,
        kf_point=jnp.where(
            kf_sel[:, None] & (ms.kf_point >= 0) &
            pt_sel[jnp.clip(ms.kf_point, 0)], ms.kf_point, -1
        ),
        kf_valid=kf_sel,
        kf_feat_valid=ms.kf_feat_valid & kf_sel[:, None],
        pt_xyz=ms.pt_xyz,
        pt_valid=pt_sel,
        kf_desc=ms.kf_desc,
        kf_angle=ms.kf_angle,
    )


def strip_descriptors(cm: CloudMap) -> CloudMap:
    """Reference-parity variant: descriptor-less cloud map
    (cloud_edge_main.cpp:884 ships bIncludeDescriptor=false)."""
    return cm._replace(kf_desc=None, kf_angle=None)


def reduce_feature_capacity(cm: CloudMap, max_feat: int) -> CloudMap:
    """Shrink the per-KF feature axis to ``max_feat`` slots.

    The rumination backend runs a heavier ORB budget than the edge tracker
    (backend.py doubles n_features for wide-baseline relocalization), so its
    CloudMap can carry more feature slots than the edge MapState has room
    for.  Keep, per keyframe, the features that matter downstream — point-
    bearing first, then other valid ones (the reference's ROSMapToORBMap
    faces no such cap because its KeyFrames are heap objects)."""
    Fc = cm.kf_uv.shape[1]
    if Fc <= max_feat:
        return cm
    # priority: has-point (2) > valid (1) > dead slot (0); stable by index
    score = (
        (cm.kf_point >= 0).astype(jnp.int32) * 2
        + cm.kf_feat_valid.astype(jnp.int32)
    ) * Fc - jnp.arange(Fc)[None, :]
    _, idx = jax.lax.top_k(score, max_feat)  # [Kc, max_feat]

    def g(arr):  # gather along the feature axis
        return jnp.take_along_axis(
            arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1
        )

    return cm._replace(
        kf_uv=g(cm.kf_uv),
        kf_octave=g(cm.kf_octave),
        kf_point=g(cm.kf_point),
        kf_feat_valid=g(cm.kf_feat_valid),
        kf_desc=None if cm.kf_desc is None else g(cm.kf_desc),
        kf_angle=None if cm.kf_angle is None else g(cm.kf_angle),
    )
