"""Validation visualization helpers.

Parity with the reference utils/train_helper.py:8-55: a jet-style depth
colormap and the 7-panel validation stack
[GT rgb | instance rgb | full rgb | instance depth | depth | GT depth |
instance opacity] logged as one image per validation round.
"""

from __future__ import annotations

import numpy as np


def visualize_depth(depth: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """(H, W) depth → (H, W, 3) float rgb; invalid (0) stays dark."""
    import matplotlib

    x = np.nan_to_num(np.asarray(depth, np.float32))
    mi = np.min(x[x > 0]) if (x > 0).any() else 0.0
    ma = np.max(x)
    x = (x - mi) / (ma - mi + 1e-8)
    x = np.clip(x, 0, 1)
    return np.asarray(matplotlib.colormaps[cmap](x))[..., :3].astype(np.float32)


def visualize_val_image(img_wh, batch, results, typ="fine") -> np.ndarray:
    """(N_panels, H, W, 3) stack — same panel order as the reference."""
    w, h = img_wh

    def img(x):
        return np.asarray(x, np.float32).reshape(h, w, -1)

    gt_rgb = img(batch["rgbs"])
    gt_depth = visualize_depth(img(batch["depths"])[..., 0])
    rgb = img(results[f"rgb_{typ}"])
    depth = visualize_depth(img(results[f"depth_{typ}"])[..., 0])
    panels = [gt_rgb]
    if f"rgb_instance_{typ}" in results:
        panels.append(img(results[f"rgb_instance_{typ}"]))
    panels.append(rgb)
    if f"depth_instance_{typ}" in results:
        panels.append(
            visualize_depth(img(results[f"depth_instance_{typ}"])[..., 0])
        )
    panels.append(depth)
    panels.append(gt_depth)
    if f"opacity_instance_{typ}" in results:
        op = np.clip(img(results[f"opacity_instance_{typ}"]), 0, 1)
        panels.append(np.repeat(op, 3, axis=-1))
    return np.stack([np.clip(p, 0, 1) for p in panels])
