"""Viewer interface: decoupled snapshot export.

Replacement for the reference's ViewerInterface contract (reference:
Snake/Map/ViewerInterface.{h,cpp} — ViewerFrame / ViewerMap snapshots built
under the read lock and pushed to the render thread; Snake/Viewer/
SnakeOpenGLViewer.h renders them with OpenGL).  This environment has no
display, so the same snapshots are exported as files: PLY point clouds +
camera frusta for any external viewer, and npz snapshots for notebook /
web-based rendering — the viewer stays decoupled from the pipeline exactly
as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from snakeslam_tpu.map.slam_map import SlamMap


@dataclass
class ViewerMapSnapshot:
    """ViewerMap analog (ViewerInterface.h:79-115)."""

    points: np.ndarray          # (P, 3)
    keyframe_poses: np.ndarray  # (K, 4, 4) world->camera
    covis_edges: np.ndarray     # (E, 2) indices into keyframe_poses
    timestamps: np.ndarray


def snapshot_map(smap: SlamMap, min_edge_weight: int = 20) -> ViewerMapSnapshot:
    ks = smap.valid_keyframes()
    ps = smap.valid_points()
    idx = {int(k): i for i, k in enumerate(ks)}
    edges = []
    for k in ks:
        cov, w = smap.covisible_keyframes(int(k), min_weight=min_edge_weight)
        for c in cov:
            if int(c) > int(k):
                edges.append((idx[int(k)], idx[int(c)]))
    return ViewerMapSnapshot(
        points=smap.pt_pos[ps].copy(),
        keyframe_poses=smap.kf_pose[ks].copy(),
        covis_edges=np.asarray(edges, dtype=np.int32).reshape(-1, 2),
        timestamps=smap.kf_timestamp[ks].copy(),
    )


def write_ply(snapshot: ViewerMapSnapshot, path):
    """ASCII PLY: map points (white) + camera centers (green)."""
    centers = np.stack([
        -T[:3, :3].T @ T[:3, 3] for T in snapshot.keyframe_poses
    ]) if len(snapshot.keyframe_poses) else np.zeros((0, 3))
    n = len(snapshot.points) + len(centers)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p in snapshot.points:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} 200 200 200\n")
        for c in centers:
            f.write(f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f} 0 255 0\n")


def export_viewer_snapshot(smap: SlamMap, out_dir, tag: str = "map"):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    snap = snapshot_map(smap)
    np.savez_compressed(
        out_dir / f"{tag}.npz",
        points=snap.points,
        keyframe_poses=snap.keyframe_poses,
        covis_edges=snap.covis_edges,
        timestamps=snap.timestamps,
    )
    write_ply(snap, out_dir / f"{tag}.ply")
    return snap
