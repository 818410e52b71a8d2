"""Scene / pose / bbox visualization without open3d.

Functional parity with the reference viewers (tools/scene_visualizer.py,
tools/O3dVisualizer.py, tools/visualize_instance_2d.py) re-targeted to the
tools available here: geometry exports to PLY (camera frusta, trajectory
polylines, bbox wireframes as colored line-segment point strips — loadable
in any viewer) and 2D figures render through matplotlib.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..data.ply_io import write_ply


def _segment_points(a, b, n=32):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return a[None] * (1 - t) + b[None] * t


def _bbox_corners(bounds):
    mn, mx = np.asarray(bounds[0]), np.asarray(bounds[1])
    return np.array(
        [[x, y, z] for x in (mn[0], mx[0]) for y in (mn[1], mx[1])
         for z in (mn[2], mx[2])]
    )


_BOX_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


class SceneVisualizer:
    """Accumulates colored geometry; `save(path)` writes one PLY — or, when
    the path ends in `.html`, a standalone interactive WebGL viewer
    (orbit/pan/zoom, layer toggles, 3D text labels — the O3dVisualizer
    interactive surface, tools/O3dVisualizer.py:25-223, without open3d)."""

    def __init__(self):
        self._pts = []
        self._colors = []
        self._tags = []  # per-block provenance: "points" | "strip" | "mesh"
        self._segments = []  # (a, b, color) — native lines for the viewer
        self._meshes = []  # dicts: vertices/faces/colors
        self._labels = []  # dicts: position/text

    def add_points(self, pts, color=(0.7, 0.7, 0.7), colors=None, _tag="points"):
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        self._pts.append(pts)
        self._tags.append(_tag)
        if colors is not None:
            self._colors.append(np.asarray(colors, np.float32).reshape(-1, 3))
        else:
            self._colors.append(np.tile(np.asarray(color, np.float32), (len(pts), 1)))

    def add_line(self, a, b, color=(1, 0, 0), samples=32):
        a = np.asarray(a, float)
        b = np.asarray(b, float)
        self._segments.append((a, b, np.asarray(color, np.float32)))
        self.add_points(_segment_points(a, b, samples), color, _tag="strip")

    def add_mesh(self, vertices, faces, color=(0.8, 0.8, 0.85), colors=None):
        """Triangle mesh (e.g. from tools/extract_mesh.py PLYs). The PLY
        export keeps vertices as points; the HTML viewer shades triangles."""
        vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        if colors is not None:
            colors = np.asarray(colors, np.float32).reshape(-1, 3)
        self._meshes.append(
            {"vertices": vertices, "faces": faces, "colors": colors,
             "color": np.asarray(color, np.float32)}
        )
        self.add_points(vertices, color=color, colors=colors, _tag="mesh")

    def add_label(self, position, text):
        """3D-anchored text (the reference's text_3d, O3dVisualizer.py)."""
        self._labels.append(
            {"position": np.asarray(position, float).reshape(3),
             "text": str(text)}
        )

    def add_bbox(self, bounds, transform=None, color=(1, 0, 0)):
        """bounds (2,3) [min;max]; optional (4,4) box→world transform."""
        corners = _bbox_corners(bounds)
        if transform is not None:
            T = np.asarray(transform)
            corners = corners @ T[:3, :3].T + T[:3, 3]
        for i, j in _BOX_EDGES:
            self.add_line(corners[i], corners[j], color)

    def add_camera(self, c2w, scale=0.1, color=(0, 0.6, 1)):
        """Draw a camera frustum for a (3|4, 4) c2w pose."""
        c2w = np.asarray(c2w)
        origin = c2w[:3, 3]
        R = c2w[:3, :3]
        # image-plane corners in camera coords (x right, y up, -z forward)
        for sx in (-1, 1):
            for sy in (-1, 1):
                corner = origin + R @ (np.array([sx * 0.5, sy * 0.375, -1.0]) * scale)
                self.add_line(origin, corner, color)

    def add_trajectory(self, poses, color=(0, 1, 0)):
        centers = np.asarray([p[:3, 3] for p in poses])
        for a, b in zip(centers[:-1], centers[1:]):
            self.add_line(a, b, color)

    def save(self, path):
        if str(path).endswith(".html"):
            return self.save_html(path)
        pts = np.concatenate(self._pts) if self._pts else np.zeros((0, 3))
        colors = np.concatenate(self._colors) if self._colors else None
        write_ply(path, pts, colors=colors)
        return path

    def save_html(self, path, title="object-nerf-tpu scene"):
        from .html_viewer import write_html_viewer

        layers = []
        # the viewer draws lines/meshes natively — only "points"-tagged
        # blocks become the point layer (strips/mesh verts are PLY-only)
        pure_pts = [b for b, t in zip(self._pts, self._tags) if t == "points"]
        pure_cols = [c for c, t in zip(self._colors, self._tags)
                     if t == "points"]
        if pure_pts:
            layers.append({
                "name": "points", "kind": "points",
                "positions": np.concatenate(pure_pts),
                "colors": np.concatenate(pure_cols),
            })
        if self._segments:
            seg_pos = np.concatenate(
                [np.stack([a, b]) for a, b, _ in self._segments]
            ).astype(np.float32)
            seg_col = np.concatenate(
                [np.stack([c, c]) for _, _, c in self._segments]
            ).astype(np.float32)
            layers.append({"name": "lines", "kind": "lines",
                           "positions": seg_pos, "colors": seg_col})
        for i, m in enumerate(self._meshes):
            tri = m["vertices"][m["faces"].reshape(-1)]
            cols = (
                m["colors"][m["faces"].reshape(-1)]
                if m["colors"] is not None
                else np.tile(m["color"], (len(tri), 1))
            )
            layers.append({"name": f"mesh_{i}", "kind": "mesh",
                           "positions": tri, "colors": cols})
        return write_html_viewer(path, layers, labels=self._labels,
                                 title=title)


def visualize_scene(pcd_path=None, poses=None, bboxes=None, out="scene_vis.ply"):
    """One-call version of the reference scene_visualizer CLI."""
    vis = SceneVisualizer()
    if pcd_path:
        from ..data.ply_io import read_ply

        mesh = read_ply(pcd_path)
        vis.add_points(mesh["points"], colors=mesh["colors"])
    for pose in poses or []:
        vis.add_camera(pose)
    if poses:
        vis.add_trajectory(poses)
    for b in bboxes or []:
        vis.add_bbox(**b) if isinstance(b, dict) else vis.add_bbox(b)
    return vis.save(out)


def visualize_instance_2d(instance_path, out_path=None, img_wh=None):
    """Instance-mask inspection (visualize_instance_2d.py equivalent):
    prints the instance ids present and saves a color-coded overlay."""
    import cv2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    inst = cv2.imread(str(instance_path), cv2.IMREAD_ANYDEPTH)
    if inst is None:
        raise FileNotFoundError(instance_path)
    if img_wh:
        inst = cv2.resize(inst, img_wh, interpolation=cv2.INTER_NEAREST)
    ids, counts = np.unique(inst, return_counts=True)
    print("instance ids:", {int(i): int(c) for i, c in zip(ids, counts)})

    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(inst, cmap="tab20", interpolation="nearest")
    for i in ids:
        ys, xs = np.nonzero(inst == i)
        ax.text(xs.mean(), ys.mean(), str(int(i)), color="white",
                fontsize=10, ha="center",
                bbox=dict(facecolor="black", alpha=0.5, pad=1))
    ax.set_title(Path(str(instance_path)).name)
    out_path = out_path or str(instance_path) + ".vis.png"
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path, {int(i): int(c) for i, c in zip(ids, counts)}
