"""Rumination backend: the non-realtime back-submap builder.

Replaces the reference's external DROID-SLAM "cloud" server (README.md:92-96;
/root/reference is only the edge — the cloud process is out-of-repo, its
output contract defined by scripts/utils/test_export_dvoid_output_to_rosmsg_
new.py).  Here the backend is our OWN batched SLAM over the uploaded bundle
(SURVEY.md §7: "the back-submap builder itself is our own batched SLAM ...
it only needs to produce the CloudMap contract").

Runs offline (no realtime pacing), with generous per-frame budgets, on the
~30-130 bundle frames.  In the distributed deployment this executes on the
rumination shard's devices (parallel/), fully overlapped with realtime
tracking.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import Config
from ..system import SlamSystem, TrackState
from . import cloud_map
from .sampler import RecordedFrame


class RuminationBackend:
    """Builds a back submap from an upload bundle of frames."""

    def __init__(self, config: Config):
        import dataclasses

        # offline budgets: the bundle is short (~30-130 frames) and paid for
        # once, so keyframe every frame and give up on dead frames fast (the
        # reference's cloud DROID-SLAM likewise keyframes densely and runs
        # without realtime constraints)
        self.cfg = dataclasses.replace(
            config,
            tracking=dataclasses.replace(
                config.tracking,
                kf_min_interval=1,
                # NEVER reset: offline, the builder must reconnect across the
                # loss gap: try relocalization briefly, then open a SECOND
                # submap for the back side — build() welds the two submaps
                # with a descriptor-matched Sim3 afterwards (the global-
                # geometry move the reference's DROID backend makes: it links
                # frames by estimated covisibility, not temporal adjacency)
                reloc_window_s=0.35,
                new_map_min_kf=3,
                new_map_min_duration_s=0.05,
                match_radius=60.0,
                match_radius_wide=120.0,
                # bundle images are KF-subsampled (big inter-frame baselines):
                # initialization cannot demand realtime-level overlap
                init_min_matches=max(40, config.tracking.init_min_matches // 2),
                init_min_inliers=max(30, config.tracking.init_min_inliers // 2),
            ),
            # offline budget: double the feature count — the back-submap must
            # relocalize across the loss gap from sparse, wide-baseline views
            # (the reference's DROID backend is likewise far heavier per frame
            # than the edge tracker)
            orb=dataclasses.replace(
                config.orb, n_features=max(512, config.orb.n_features),
            ),
        )

    def build(self, bundle: list[RecordedFrame],
              anchor_times=()) -> Optional[cloud_map.CloudMap]:
        """Run offline SLAM over the bundle; return one spanning submap as a
        CloudMap, or None if reconstruction failed.

        ``anchor_times``: timestamps the edge holds keyframes at — the
        backend forces keyframes there so the CloudMap shares exact
        timestamps with the live maps, which is what the merge's timestamp
        data-association keys on (reference CloudMerging.cc:147-164; its
        DROID backend gets this for free because the upload IS the KF list).

        If the loss gap split the reconstruction into two submaps, weld them
        with a descriptor-matched Sim3 between their best-matching keyframe
        pair (Horn RANSAC on 3D-3D pairs, tracking/loop_closing.verify_loop)
        — the bundle-global association the reference delegates to DROID's
        covisibility factor graph."""
        import jax.numpy as jnp

        anchor_times = np.asarray(sorted(anchor_times))
        slam = SlamSystem(self.cfg)
        ok_frames = 0
        usable = 0
        for f in bundle:
            # degenerate (near-constant) frames — the loss events
            # themselves: covered lens, textureless wall — carry no
            # reconstructable signal for ANY backend (the reference's
            # DROID server gets real blurred-but-textured frames) and
            # must not count against the success-fraction gate below
            if float(np.std(f.image)) > 1.0:
                usable += 1
            if (len(anchor_times)
                    and np.min(np.abs(anchor_times - f.time)) < 1e-4):
                # force the staleness trigger of NeedNewKeyFrame so an
                # anchor frame (if tracked OK) becomes a keyframe
                slam.frames_since_kf = max(slam.frames_since_kf, 15)
            st = slam.track_monocular(jnp.asarray(f.image), f.time)
            if st == TrackState.OK:
                ok_frames += 1
        if slam.stats["n_kf"] < 4 or ok_frames < max(4, usable * 0.25):
            return None
        ms = slam.ms
        from ..mapstate import map_state as M

        counts = [
            int(M.map_kf_count(ms, m)) for m in range(int(ms.n_maps))
        ]
        order = np.argsort(counts)[::-1]
        best = int(order[0])
        if counts[best] < 4:
            return None
        if len(order) > 1 and counts[int(order[1])] >= 2:
            second = int(order[1])
            welded = self._weld_submaps(slam, best, second)
            if welded is not None:
                ms = welded
        return cloud_map.from_map_state(ms, best)

    def _weld_submaps(self, slam: SlamSystem, dst_map: int, src_map: int,
                      *, min_inliers: int = 10):
        """Sim3-weld ``src_map`` into ``dst_map`` inside the backend's own
        MapState; returns the welded MapState or None.

        Method: PnP each src keyframe's raw features against the dst
        submap's observation bank (tracker.relocalize_map — guided-sampling
        DLT RANSAC), giving each src KF a pose IN DST WORLD.  Two or more
        such poses fix the inter-map scale by baseline ratio, and any anchor
        fixes the rigid part: S = T_dst(b)^-1 ∘ scale(s) ∘ T_src(b).  This
        avoids Horn on 3D-3D pairs, which is fragile against the newborn
        back submap's depth noise."""
        import jax
        import jax.numpy as jnp

        from ..geometry import lie
        from ..mapstate import map_state as M
        from ..ops import orb
        from ..tracking import tracker

        ms = slam.ms
        kf_map = np.asarray(ms.kf_map_id)
        kf_v = np.asarray(ms.kf_valid)
        src_rows = np.flatnonzero(kf_v & (kf_map == src_map))
        if len(src_rows) < 2:
            return None

        # spread anchor attempts across the src submap (first KFs sit at
        # the gap boundary where overlap with dst is often worst)
        if len(src_rows) > 8:
            pick = np.unique(np.linspace(0, len(src_rows) - 1, 8).astype(int))
            src_try = src_rows[pick]
        else:
            src_try = src_rows
        anchors = []  # (n_inl, row, T_dst [7])
        for rank, b in enumerate(src_try):
            feats = orb.Features(
                uv=ms.kf_uv[b], response=jnp.zeros_like(ms.kf_angle[b]),
                angle=ms.kf_angle[b], octave=ms.kf_octave[b],
                desc=ms.kf_desc[b], valid=ms.kf_feat_valid[b],
            )
            tr, _ = tracker.relocalize_map(
                jax.random.PRNGKey(1000 + rank), ms, slam.K, feats,
                map_id=dst_map,
            )
            if int(tr.n_inliers) >= min_inliers:
                anchors.append((int(tr.n_inliers), int(b), tr.pose))
        if len(anchors) < 2:
            return None
        anchors.sort(reverse=True)

        def center(T):
            return np.asarray(lie.se3_t(lie.se3_inverse(T)))

        # scale: median baseline ratio over anchor pairs
        ratios = []
        for i in range(len(anchors)):
            for j in range(i + 1, len(anchors)):
                bd = np.linalg.norm(center(anchors[i][2]) - center(anchors[j][2]))
                bs = np.linalg.norm(
                    center(ms.kf_pose[anchors[i][1]])
                    - center(ms.kf_pose[anchors[j][1]])
                )
                if bs > 1e-6 and bd > 1e-6:
                    ratios.append(bd / bs)
        if not ratios:
            return None
        s = float(np.median(ratios))

        # S = T_dst(b)^-1 ∘ diag(s) ∘ T_src(b) from the strongest anchor
        _, b, T_dst = anchors[0]
        S_scale = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, np.log(s)], jnp.float32)
        S = lie.sim3_compose(
            lie.sim3_from_se3(lie.se3_inverse(T_dst)),
            lie.sim3_compose(S_scale, lie.sim3_from_se3(ms.kf_pose[b])),
        )

        from .coordinator import correct_pose

        sel_kf = jnp.asarray(kf_v & (kf_map == src_map))
        sel_pt = ms.pt_valid & (ms.pt_map_id == src_map)
        new_poses = jax.vmap(lambda T: correct_pose(T, S))(ms.kf_pose)
        new_pts = lie.sim3_apply(S, ms.pt_xyz)
        ms = ms._replace(
            kf_pose=jnp.where(sel_kf[:, None], new_poses, ms.kf_pose),
            pt_xyz=jnp.where(sel_pt[:, None], new_pts, ms.pt_xyz),
        )
        return M.relabel_map(ms, src_map, dst_map)
