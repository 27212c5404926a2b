"""Synthetic dataset source: feature-level frames for tests and benchmarks.

Analog of the reference's feature-cache replay input path
(reference: Snake/Preprocess/FeatureDetector.cpp:94-139) — frames arrive as
keypoints+descriptors, bypassing image-space detection.
"""

from __future__ import annotations

import numpy as np

from snakeslam_tpu.map.slam_map import FrameData
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.utils.synthetic import SyntheticWorld


def apply_world_to_settings(world: SyntheticWorld, settings: Settings):
    settings.fx = world.fx
    settings.fy = world.fy
    settings.cx = world.cx
    settings.cy = world.cy
    settings.width, settings.height = world.image_size
    settings.bf = world.bf
    settings.fd_levels = world.levels
    settings.fd_scale_factor = world.scale_factor


def synthetic_frames(
    world: SyntheticWorld,
    trajectory,
    settings: Settings,
    noise_px: float = 0.3,
    desc_flip_p: float = 0.01,
    n_clutter: int = 50,
    max_features: int = 900,
):
    """Yield FrameData for each (timestamp, pose_cw) of a trajectory."""
    with_depth = settings.input_type == InputType.RGBD
    with_stereo = settings.input_type == InputType.Stereo
    for i, (ts, pose_cw) in enumerate(trajectory):
        sf = world.observe(
            pose_cw,
            timestamp=ts,
            max_features=max_features,
            noise_px=noise_px,
            desc_flip_p=desc_flip_p,
            n_clutter=n_clutter,
            with_depth=with_depth or with_stereo,
            with_stereo=with_stereo,
        )
        yield FrameData(
            frame_id=i,
            timestamp=ts,
            uv=sf.uv,
            octave=sf.octave,
            angle=sf.angle,
            descriptors=sf.descriptors,
            right=sf.right,
            depth=sf.depth,
            gt_pose_cw=sf.pose_cw,
        )
