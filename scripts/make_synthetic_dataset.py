"""Materialize the procedural test scene as an on-disk NeRF-style dataset.

    python scripts/make_synthetic_dataset.py out=data/synthetic_desk \
        "img_wh=[96,72]" n_frames=24

Writes the exact ToyDesk-style layout the reference consumes:
transforms_full.json (OpenCV-convention poses + idx), full/<i>.png RGB,
<i>.depth.png (16-bit mm z-depth), <i>.instance.png masks, a point cloud
pcd.ply for the voxel grid, an oriented-bbox bbox.json per object, and a
train-split file — so the GenericDataset / voxel / editable-render paths
all run end-to-end without downloading ScanNet or ToyDesk.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(out_dir, img_wh=(96, 72), n_frames=24, detail=False):
    """detail=True writes the FINE variant: a lawn of small (r 0.04-0.07)
    spheres plus a 12-cells/unit floor checker — sub-voxel structure for
    the progressive-training A/B (scripts/progressive_ab.py --detail)."""
    import cv2
    from object_nerf_tpu.data.synthetic import (
        _default_spheres, _detail_spheres, trace, look_at,
    )
    from object_nerf_tpu.data.ray_utils import get_ray_directions, get_rays
    from object_nerf_tpu.data.ply_io import write_ply

    w, h = img_wh
    out = os.path.join(out_dir)
    os.makedirs(os.path.join(out, "full"), exist_ok=True)
    focal = 0.7 * w
    fov_x = 2 * np.arctan(w / 2 / focal)
    directions = get_ray_directions(h, w, focal)
    dirs_norm = np.linalg.norm(directions.reshape(-1, 3), axis=-1)
    spheres = _detail_spheres() if detail else _default_spheres()
    checker_scale = 12.0 if detail else 4.0
    fix_rot = np.array([1, 0, 0, 0, -1, 0, 0, 0, -1]).reshape(3, 3)

    frames = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        radius = 1.8 + 0.2 * np.sin(3 * ang)
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang),
                        1.1 + 0.2 * np.cos(2 * ang)])
        c2w = look_at(eye, np.array([0.0, 0.0, 0.2]))
        rays_o, rays_d = get_rays(directions, c2w)
        rgb, depth, inst = trace(rays_o, rays_d, spheres, checker_scale)
        depth = np.where(depth > 5.0, 0.0, depth)
        cv2.imwrite(os.path.join(out, "full", f"{i}.png"),
                    (rgb.reshape(h, w, 3)[..., ::-1] * 255).astype(np.uint8))
        zdepth = np.where(depth > 0, depth / dirs_norm, 0.0)
        cv2.imwrite(os.path.join(out, "full", f"{i}.depth.png"),
                    (zdepth.reshape(h, w) * 1000).astype(np.uint16))
        cv2.imwrite(os.path.join(out, "full", f"{i}.instance.png"),
                    inst.reshape(h, w).astype(np.uint16))
        pose_cv = np.eye(4)
        pose_cv[:3, :3] = c2w[:3, :3] @ fix_rot
        pose_cv[:3, 3] = c2w[:3, 3]
        frames.append({"file_path": f"./full/{i}",
                       "transform_matrix": pose_cv.tolist(), "idx": i})

    with open(os.path.join(out, "transforms_full.json"), "w") as f:
        json.dump({"camera_angle_x": float(fov_x), "frames": frames}, f,
                  indent=2)

    # point cloud: surface samples of the scene (plane + spheres)
    rng = np.random.RandomState(0)
    pts = [rng.rand(1500, 3) * [2.8, 2.8, 0.0] - [1.4, 1.4, 0.0]]
    for s in spheres:
        d = rng.randn(600, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(s.center + s.radius * d)
    # bboxes/masks only exist for the labeled objects (instance_id > 0)
    spheres = [s for s in spheres if s.instance_id > 0]
    write_ply(os.path.join(out, "pcd.ply"), np.concatenate(pts))

    # ToyDesk-style oriented bboxes for each sphere object
    labels = []
    for s in spheres:
        labels.append({
            "id": int(s.instance_id),
            "data": {
                "position": [float(x) for x in s.center],
                "quaternion": [0.0, 0.0, 0.0, 1.0],
                "scale": [float(2.2 * s.radius)] * 3,
            },
        })
    with open(os.path.join(out, "bbox.json"), "w") as f:
        json.dump({"labels": labels}, f, indent=2)

    # split: every frame trains except the last two
    split_dir = os.path.join(out, "split")
    os.makedirs(split_dir, exist_ok=True)
    with open(os.path.join(split_dir, "train.txt"), "w") as f:
        f.write("\n".join(str(i) for i in range(n_frames - 2)))
    print(f"wrote {n_frames} frames to {out}")
    return out


def main(argv):
    from object_nerf_tpu.config import Config

    cfg = Config.from_dotlist(argv)
    make_dataset(
        cfg.get("out", "data/synthetic_desk"),
        img_wh=tuple(cfg.get("img_wh", [96, 72])),
        n_frames=int(cfg.get("n_frames", 24)),
        detail=bool(cfg.get("detail", False)),
    )


if __name__ == "__main__":
    main(sys.argv[1:])
