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
                # loss gap by relocalizing against its own front-side map —
                # that single spanning submap is what makes the double merge
                # possible (the reference's DROID backend similarly treats
                # the bundle as one global problem)
                reloc_window_s=1e9,
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

    def build(self, bundle: list[RecordedFrame]) -> Optional[cloud_map.CloudMap]:
        """Run offline SLAM over the bundle; return its largest submap as a
        CloudMap, or None if reconstruction failed."""
        import jax.numpy as jnp

        slam = SlamSystem(self.cfg)
        ok_frames = 0
        for f in bundle:
            st = slam.track_monocular(jnp.asarray(f.image), f.time)
            if st == TrackState.OK:
                ok_frames += 1
        if slam.stats["n_kf"] < 4 or ok_frames < len(bundle) * 0.25:
            return None
        ms = slam.ms
        # largest submap by KF count
        from ..mapstate import map_state as M

        counts = [
            int(M.map_kf_count(ms, m)) for m in range(int(ms.n_maps))
        ]
        best = int(np.argmax(counts))
        if counts[best] < 4:
            return None
        return cloud_map.from_map_state(ms, best)
