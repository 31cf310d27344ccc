"""Single dataclass configuration (replaces the reference's three config
tiers: ROS launch params, YAML Settings, and compile-time flags —
/root/reference/src/rumi-slam/lib_src/Settings.cc, launch/main.launch)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    fx: float = 525.0
    fy: float = 525.0
    cx: float = 319.5
    cy: float = 239.5
    width: int = 640
    height: int = 480
    fps: float = 30.0
    # stereo / RGB-D (reference Settings: Camera.bf, ThDepth, DepthMapFactor)
    baseline: float = 0.0            # meters; 0 = monocular
    th_depth: float = 40.0           # close/far point gate (x baseline units
                                     # in the reference; meters here)
    depth_factor: float = 5000.0     # raw TUM depth png units per meter
    # radtan distortion (reference Camera1.k1/k2/p1/p2[/k3]; keypoints are
    # undistorted once after extraction, Frame::UndistortKeyPoints)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    # camera model: "pinhole" (radtan distortion above) or "kb8" fisheye
    # (reference Camera.type PinHole / KannalaBrandt8, Settings.cc); for kb8
    # keypoints are rectified to the ideal pinhole (fx..cy) once after
    # extraction, keeping the compiled pipeline single-model
    model: str = "pinhole"
    kb_coeffs: tuple = (0.0, 0.0, 0.0, 0.0)  # KB8 k0..k3

    @property
    def bf(self) -> float:
        return self.fx * self.baseline

    @property
    def dist_coeffs(self):
        return (self.k1, self.k2, self.p1, self.p2, self.k3)


@dataclasses.dataclass(frozen=True)
class ORBConfig:
    # reference: config/TUM3.yaml ORBextractor.* (nFeatures=2000, 8 levels);
    # budget is total across levels here.
    n_features: int = 1024
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    cell: int = 32
    k_cell: int = 5


@dataclasses.dataclass(frozen=True)
class MapConfig:
    max_kf: int = 256
    max_pt: int = 16384
    local_window: int = 8        # KFs in local BA window
    local_ba_iters: int = 6
    # fixed boundary ring: out-of-window KFs observing window points enter
    # local BA with the camera held fixed (reference Optimizer.cc:1041-1055);
    # bounded to the top-N by shared-observation count, 0 = off
    lba_fixed_ring: int = 6
    min_covis_weight: int = 15
    # reference launch/main.launch:33 kf_culling (default false)
    kf_culling: bool = False
    # run local mapping in a worker thread overlapped with tracking (the
    # reference's LocalMapping thread); False executes it inline after each
    # keyframe (deterministic — tests use this)
    overlapped: bool = True
    # loop closing stays active alongside the rumination merge (reference
    # activeLC from YAML loopClosing, System.cc:99-103)
    loop_closing: bool = True
    loop_check_interval: int = 4   # check every Nth keyframe
    loop_min_score: int = 30       # retrieval score gate
    loop_min_inliers: int = 25     # Sim3 verification gate
    # GBA after a verified loop closure (reference LoopClosing.cc:916
    # launches RunGlobalBundleAdjustment after CorrectLoop); 0 = off
    loop_gba_iters: int = 8


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    match_radius: float = 15.0       # motion-model projection window (px)
    match_radius_wide: float = 30.0  # fallback / local-map window
    max_hamming: float = 80.0
    nn_ratio: float = 0.85
    min_track_inliers: int = 15      # reference: <15 matches -> lost-ish
    min_localmap_inliers: int = 30
    kf_min_interval: int = 3         # frames between KFs (min)
    kf_tracked_ratio: float = 0.8    # new KF if inliers < ratio * ref KF obs
    reloc_window_s: float = 3.0      # reference Tracking.cc:1716
    min_init_depth_points: int = 100  # stereo/RGB-D init gate (ref: 500 kp)
    max_new_depth_points: int = 128   # per-KF depth-created points (ref: 100)
    # monocular two-view initialization gates (reference
    # SearchForInitialization >= 100 matches, ReconstructWithTwoViews support)
    init_min_matches: int = 80
    init_min_inliers: int = 60
    # new-submap gates on LOST (reference Tracking.cc:1924-1933:
    # KF count, duration, AND trajectory curvature = path/chord;
    # curvature default 0.0 = disabled, CloudImageSampler.h:80)
    new_map_min_kf: int = 10
    new_map_min_duration_s: float = 1.0
    new_map_min_curvature: float = 0.0


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    # reference launch/main.launch:30-41
    n_track_last: int = 40           # edge-front tail KFs in upload bundle
    n_new_track_first: int = 40      # edge-back head KFs
    min_time_s: float = 3.0
    pd_kp: float = 0.8
    pd_kd: float = 0.08
    pd_setpoint: float = 12.0        # target mean optical-flow magnitude
    max_track_last: int = 50
    min_bundle: int = 30
    # bounded full-rate context windows either side of the loss gap (the
    # reference ships KF-subsampled images because DROID tracks across any
    # baseline, CloudImageSampler.cc:104-145; a sparse-feature backend
    # needs temporal density — window seconds, thinned to max_track_last)
    context_window_s: float = 1.6
    # maturity gate on the edge-back map's trajectory curvature
    # (reference nNewTrackFirstMinTrajCurvature, CloudImageSampler.h:80 —
    # default 0.0 = disabled)
    min_traj_curvature: float = 0.0


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    max_match_kf: int = 40           # reference CloudMerging.cc:100
    time_tolerance_s: float = 1e-4   # timestamp association tolerance
    pixel_radius: float = 3.0        # keypoint association radius (px)
    min_inlier_ratio: float = 0.1    # accept gate (CloudMerging.cc:815)
    welding_covis: int = 5           # extra covisible KFs in welding window
    sim3_iters: int = 8
    # relaunch global BA after a successful double merge (reference
    # CloudMerging.cc:243-250/:365-372 relaunches its GBA thread); routed
    # through the distributed PCG Schur engine when >1 device is visible
    run_gba: bool = True
    gba_iters: int = 12
    # one retry of a failed cloud/back merge with widened association
    # tolerances (the reference's merge_anyway spirit, launch/main.launch:34)
    retry_widened: bool = True
    retry_pixel_radius: float = 6.0
    retry_min_inlier_ratio: float = 0.05


@dataclasses.dataclass(frozen=True)
class Config:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    orb: ORBConfig = dataclasses.field(default_factory=ORBConfig)
    mapping: MapConfig = dataclasses.field(default_factory=MapConfig)
    tracking: TrackConfig = dataclasses.field(default_factory=TrackConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)
    merge: MergeConfig = dataclasses.field(default_factory=MergeConfig)
    # logging threshold (reference Verbose::SetTh, System.cc:247 sets QUIET):
    # QUIET | NORMAL | VERBOSE | VERY_VERBOSE | DEBUG
    verbosity: str = "QUIET"

    def intrinsics(self):
        import jax.numpy as jnp

        c = self.camera
        return jnp.asarray([c.fx, c.fy, c.cx, c.cy], jnp.float32)


def tiny_config(**over) -> Config:
    """Small capacities for tests."""
    base = Config(
        camera=CameraConfig(width=320, height=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5),
        orb=ORBConfig(n_features=256, n_levels=3),
        mapping=MapConfig(max_kf=64, max_pt=4096, local_window=5,
                          overlapped=False),
        tracking=TrackConfig(min_track_inliers=12, min_localmap_inliers=20,
                             new_map_min_kf=4, new_map_min_duration_s=0.3),
        sampler=SamplerConfig(n_track_last=10, n_new_track_first=5,
                              min_time_s=0.4, min_bundle=10),
        merge=MergeConfig(max_match_kf=16),
    )
    return dataclasses.replace(base, **over)
