"""Editable scene renderer: move / rotate / duplicate / remove objects.

Parity with the reference `EditableRenderer`
(render_tools/editable_renderer.py:52-332):

* edit state: `active_object_ids` (0 = background), per-(object,
  duplication) pose transforms, per-object `BBoxRayHelper`s,
  `object_to_remove` → background carve-out boxes;
* `render_edit(h, w, Twc, fovx)`: per active object, the user pose is
  conjugated into the object's canonical frame —
  `transform = inv(Tow_orig) @ user_pose @ Tow_orig`, `Tow = inv(transform)`
  — i.e. **object motion is implemented by counter-transforming the camera
  rays**; one ray set per object with bbox-clipped near/far (0/0 on miss ⇒
  muted samples), then joint sort-merge compositing (render/multi.py);
* `render_origin` renders the unedited scene through the same path;
* `load_frame_meta` reads dataset camera poses (+fov) for demo trajectories.

TPU-native: pose math stays on the host (numpy, trivially small); on TPU
each chunk dispatches as split programs — Pallas kernel programs isolated
from the sampling/sort/gather glue (render/multi.make_multi_eval_stages,
the same measured program-composition win as the single-scene eval) —
with asynchronous chunk dispatch; elsewhere a chunk is one jitted program.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..data.ray_utils import get_ray_directions, get_rays
from ..data.geo_utils import center_pose_from_avg
from ..parallel.mesh import make_mesh, replicate
from ..render.renderer import RenderSettings
from ..render.multi import (
    render_rays_multi, make_multi_eval_stages, compact_hit_order,
)
from .bbox import BBoxRayHelper, boxes_to_arrays


def read_testing_config(cli_args=None, config_path=None):
    """Edit-time config: edit yaml < CLI, then merge the ckpt's training
    snapshot under `ckpt_config` (editable_renderer.py:25-49)."""
    cli = Config.from_dotlist(cli_args or [])
    if config_path is None:
        config_path = cli["config"]
    cfg = Config.from_yaml(config_path)
    cfg.merge(cli)

    ckpt_conf_path = os.path.join(
        os.path.dirname(os.path.abspath(cfg.ckpt_path)),
        "run_config_snapshot.yaml",
    )
    cfg["ckpt_config_path"] = ckpt_conf_path
    cfg["ckpt_config"] = Config.from_yaml(ckpt_conf_path).to_dict()

    pcd_file = os.path.join(
        os.path.dirname(os.path.abspath(cfg.ckpt_path)), "pcd.ply"
    )
    if os.path.exists(pcd_file):
        cfg.ckpt_config.dataset_extra.pcd_path = pcd_file
    return cfg


class EditableRenderer:
    def __init__(self, config, params=None, voxel=None, mesh=None):
        """config: the merged edit config (read_testing_config). If `params`
        is given, skips checkpoint loading (tests inject fresh params).
        `mesh`: the device mesh — defaults to all devices, like
        ObjectNeRFSystem; on >1 devices the edit render runs SPMD (rays
        sharded, params replicated — the reference's DDP semantics,
        train.py:261-262, extended to the L5 edit path)."""
        self.config = config
        self.ckpt_config = Config(config.ckpt_config)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size

        dataset_extra = self.ckpt_config.dataset_extra
        self.near = float(config.get("near", dataset_extra.near))
        self.far = float(config.get("far", dataset_extra.far))
        self.scale_factor = float(dataset_extra.scale_factor)
        self.pose_avg = np.concatenate(
            [np.eye(3), np.array(dataset_extra["scene_center"])[:, None]], 1
        )

        self.use_voxel = bool(
            self.ckpt_config.model.get("use_voxel_embedding", True)
        )
        # tpu.* hooks, same contract as ObjectNeRFSystem: the ckpt's
        # training config provides defaults, the edit config overrides
        # (reference editable_renderer.py:25-49 merge order)
        tpu_cfg = dict(self.ckpt_config.get("tpu", {}) or {})
        tpu_cfg.update(dict(config.get("tpu", {}) or {}))
        use_pallas = tpu_cfg.get("use_pallas", "auto")
        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        # all-miss chunks run the background-only program (render/multi.
        # compact_hit_order); off by default only for bit-exact-dense needs
        self.compact_rays = bool(tpu_cfg.get("compact_edit_rays", True))
        pallas_kw = dict(
            pallas_interpret=bool(tpu_cfg.get("pallas_interpret", False))
        )
        if pallas_kw["pallas_interpret"]:
            pallas_kw["pallas_dtype"] = "float32"
        if self.n_devices > 1:
            # Pallas launches shard_map their ray axis over the mesh
            # (GSPMD can't partition tpu_custom_call — parallel/mesh.py)
            pallas_kw["shard_mesh"] = self.mesh
        self.settings = RenderSettings.from_config(
            self.ckpt_config, is_eval=True, use_pallas=bool(use_pallas),
            **pallas_kw,
        )

        if params is None:
            params, voxel = self._load_model(config.ckpt_path)
        self.params = params
        self.voxel_ctx = voxel  # (features, topo, static) or None
        if self.n_devices > 1:
            self.params = replicate(self.params, self.mesh)
            if self.voxel_ctx is not None:
                features, topo, static = self.voxel_ctx
                self.voxel_ctx = (
                    self.params.get("voxel_features",
                                    replicate(features, self.mesh)),
                    replicate(topo, self.mesh),
                    static,
                )
        if self.n_devices > 1:
            # the chunk ray stack is (K objects, N rays, 8): shard the RAY
            # axis — same device_put-per-chunk pattern as
            # ObjectNeRFSystem.render_image (train/system.py:476-484)
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._stack_sharding = NamedSharding(
                self.mesh, P(None, self.mesh.axis_names[0])
            )
        else:
            self._stack_sharding = None

        self.object_to_remove: List[int] = []
        self.active_object_ids: List[int] = [0]
        self.object_pose_transform: Dict[str, np.ndarray] = {}
        self.object_bbox_ray_helpers: Dict[str, BBoxRayHelper] = {}
        self.bbox_enlarge = 0.0
        self.key = jax.random.PRNGKey(0)
        self._chunk_fns = {}
        self._ct_fn = None

    # -- model loading ---------------------------------------------------------
    def _load_model(self, ckpt_path):
        from ..train.checkpoint import load_any_checkpoint
        from ..models import voxel_grid as vg

        restored = load_any_checkpoint(ckpt_path, self.ckpt_config.model)
        params = restored["params"]
        voxel_ctx = None
        if self.use_voxel:
            features = params.get("voxel_features")
            topo_dict = restored.get("voxel_topo")
            static_dict = restored.get("voxel_static")
            if topo_dict is not None and static_dict is not None:
                topo = vg.topology_from_dict(
                    topo_dict, capacity=int(features.shape[0])
                )
                static = vg.VoxelStatic(
                    shape=tuple(int(x) for x in np.asarray(static_dict["shape"])),
                    channels=int(static_dict["channels"]),
                    n_freq_voxel=int(static_dict["n_freq_voxel"]),
                    n_max_voxels=int(static_dict["n_max_voxels"]),
                )
                voxel_ctx = (features, topo, static)
            elif restored.get("voxel_torch") is not None:
                voxel_ctx = self._voxel_from_torch(restored["voxel_torch"], params)
        return params, voxel_ctx

    def _voxel_from_torch(self, vt, params):
        """Rebuild VoxelTopology from converted reference buffers."""
        from ..models import voxel_grid as vg

        features, topo, static = vg.from_torch_buffers(
            vt, int(self.ckpt_config.model.N_freq_voxel)
        )
        params["voxel_features"] = features
        return (features, topo, static)

    # -- frame metadata ----------------------------------------------------------
    def load_frame_meta(self):
        import json

        dataset_extra = self.ckpt_config.dataset_extra
        with open(
            os.path.join(dataset_extra.root_dir, "transforms_full.json")
        ) as f:
            self.dataset_meta = json.load(f)
        self.fov_x_deg_dataset = (
            self.dataset_meta["camera_angle_x"] * 180 / np.pi
        )
        fix_rot = np.array([1, 0, 0, 0, -1, 0, 0, 0, -1]).reshape(3, 3)
        poses, idxs = [], []
        for frame in self.dataset_meta["frames"]:
            pose = np.array(frame["transform_matrix"])
            pose[:3, :3] = pose[:3, :3] @ fix_rot
            poses.append(pose)
            idxs.append(frame["idx"])
        order = np.argsort(np.array(idxs))
        self.poses = np.array(poses)[order]

    def get_camera_pose_by_frame_idx(self, frame_idx):
        return self.poses[frame_idx]

    # -- edit state -----------------------------------------------------------
    def remove_scene_object_by_ids(self, obj_ids):
        self.object_to_remove = list(obj_ids)
        for obj_id in obj_ids:
            self.initialize_object_bbox(obj_id)

    def reset_active_object_ids(self):
        self.active_object_ids = [0]

    def set_object_pose_transform(self, obj_id: int, pose: np.ndarray,
                                  obj_dup_id: int = 0):
        self.active_object_ids.append(obj_id)
        if str(obj_id) not in self.object_bbox_ray_helpers:
            self.initialize_object_bbox(obj_id)
        self.object_pose_transform[f"{obj_id}_{obj_dup_id}"] = pose

    def initialize_object_bbox(self, obj_id: int):
        self.object_bbox_ray_helpers[str(obj_id)] = BBoxRayHelper(
            self.config.get("ckpt_config_path", Config(
                {"dataset_name": self.ckpt_config.dataset_name,
                 "dataset_extra": self.ckpt_config.dataset_extra}
            )),
            obj_id,
        )

    def get_object_bbox_helper(self, obj_id: int):
        return self.object_bbox_ray_helpers[str(obj_id)]

    def get_skipping_bbox_helper(self):
        return {
            str(i): self.object_bbox_ray_helpers[str(i)]
            for i in self.object_to_remove
        }

    # -- ray generation ----------------------------------------------------------
    def generate_rays(self, obj_id: int, rays_o, rays_d):
        """(N, 8) rays; objects get bbox-clipped near/far, misses get 0/0
        (editable_renderer.py:153-181)."""
        n = len(rays_o)
        if obj_id == 0:
            near = np.full((n, 1), self.near / self.scale_factor, np.float32)
            far = np.full((n, 1), self.far / self.scale_factor, np.float32)
        else:
            hit, near, far = self.object_bbox_ray_helpers[
                str(obj_id)
            ].get_ray_bbox_intersections(
                rays_o, rays_d, self.scale_factor, bbox_enlarge=self.bbox_enlarge
            )
            near = np.where(hit[:, None], near, 0.0).astype(np.float32)
            far = np.where(hit[:, None], far, 0.0).astype(np.float32)
        return np.concatenate(
            [rays_o.astype(np.float32), rays_d.astype(np.float32), near, far], -1
        )

    # -- rendering ------------------------------------------------------------
    def _prebuild_corner_table(self):
        """Eval-only: the voxel corner table is a pure function of the
        frozen features — build it ONCE per frame and thread it through
        every chunk program (same hoist as train/system.make_render_fn)."""
        from ..models import voxel_grid as vg

        if self._ct_fn is None:
            _, _, static = self.voxel_ctx
            lowp = (
                self.settings.use_pallas
                and self.settings.pallas_dtype == "bfloat16"
            )

            @jax.jit
            def ct_fn(features, voxel_topo):
                return vg.make_corner_table(
                    features, voxel_topo, static, lowp=lowp
                )

            self._ct_fn = ct_fn
        _, topo, _ = self.voxel_ctx
        return self._ct_fn(self.params["voxel_features"], topo)

    def _get_chunk_fn(self, obj_ids, settings, use_split, voxel_static,
                      white_back, chunk, has_skip):
        """Per-(edit-configuration, chunk-kind) compiled chunk renderer."""
        sig = (tuple(obj_ids), white_back, chunk, has_skip, use_split)
        if sig not in self._chunk_fns:
            if use_split:
                self._chunk_fns[sig] = make_multi_eval_stages(
                    settings, tuple(obj_ids), voxel_static=voxel_static,
                )
            else:
                ids_t = tuple(obj_ids)

                def fn(params, rays_stack, key, voxel_features, sboxes):
                    voxel_ctx = None
                    if self.voxel_ctx is not None:
                        _, topo, static = self.voxel_ctx
                        voxel_ctx = (voxel_features, topo, static)
                    out = render_rays_multi(
                        params, list(rays_stack), ids_t, key,
                        settings, voxel_ctx=voxel_ctx, skip_boxes=sboxes,
                    )
                    typ = "fine" if settings.N_importance > 0 else "coarse"
                    return {k: out[k] for k in
                            (f"rgb_{typ}", f"depth_{typ}", f"opacity_{typ}")}
                self._chunk_fns[sig] = jax.jit(fn)
        return self._chunk_fns[sig]

    def _render_multi(self, rays_list, obj_ids, white_back, chunk):
        n = rays_list[0].shape[0]
        skip_helpers = self.get_skipping_bbox_helper()
        skip_boxes = None
        if skip_helpers:
            a, b, s = boxes_to_arrays(skip_helpers, self.scale_factor)
            skip_boxes = (jnp.asarray(a), jnp.asarray(b), s)

        import dataclasses
        settings = dataclasses.replace(
            self.settings, white_back=white_back, perturb=0.0, noise_std=0.0,
            is_eval=True,
        )

        # split-program fast path (TPU): Pallas kernel programs isolated
        # from the sampling/sort/gather glue (render/multi.
        # make_multi_eval_stages — the same measured program-composition
        # effect the single-scene eval split exploits). The voxel path
        # additionally needs the dense corner-table route.
        use_split = settings.use_pallas
        voxel_topo = voxel_static = None
        if self.voxel_ctx is not None:
            from ..models import voxel_grid as vg

            _, voxel_topo, voxel_static = self.voxel_ctx
            use_split = use_split and vg._dense_path_ok(voxel_static)

        # hit compaction: reorder pixels so object-bbox hits are contiguous;
        # all-miss chunks then run the background-only program (~1e-8
        # deviation from the dense composite — render/multi.compact_hit_order)
        plan = (
            compact_hit_order(rays_list, obj_ids, chunk)
            if self.compact_rays else None
        )
        if plan is not None:
            perm, n_mixed = plan
            rays_list = [np.asarray(r)[perm] for r in rays_list]

        ct = None
        if use_split and self.voxel_ctx is not None:
            ct = self._prebuild_corner_table()
        voxel_features = (
            self.params.get("voxel_features")
            if self.voxel_ctx is not None
            else jnp.zeros((1, 1))
        )
        outs = []
        for ci, i in enumerate(range(0, n, chunk)):
            mixed = plan is None or ci < plan[1]
            ids_c = list(obj_ids) if mixed else [0]
            fn = self._get_chunk_fn(
                ids_c, settings, use_split, voxel_static,
                white_back, chunk, skip_boxes is not None,
            )
            chunk_rays = [
                jnp.asarray(r[i : i + chunk])
                for r in (rays_list if mixed else rays_list[:1])
            ]
            # pad the tail chunk to static shape
            pad = chunk - chunk_rays[0].shape[0]
            if pad > 0:
                chunk_rays = [
                    jnp.concatenate([r, jnp.repeat(r[-1:], pad, 0)]) for r in chunk_rays
                ]
            stack = jnp.stack(chunk_rays)
            if self._stack_sharding is not None and chunk % self.n_devices == 0:
                # multi-chip: shard the chunk's ray axis so every chunk
                # program runs SPMD (params already replicated)
                stack = jax.device_put(stack, self._stack_sharding)
            if use_split:
                outs.append(
                    fn(self.params, stack,
                       voxel_topo=voxel_topo, ct=ct, skip_boxes=skip_boxes)
                )
            else:
                self.key, sub = jax.random.split(self.key)
                outs.append(
                    fn(self.params, stack, sub, voxel_features, skip_boxes)
                )
        merged = {
            k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)[:n]
            for k in outs[0]
        }
        if plan is not None:
            # scatter back to pixel order: row j carries ray perm[j]
            perm = plan[0]
            for k, v in merged.items():
                unperm = np.empty_like(v)
                unperm[perm] = v
                merged[k] = unperm
        return merged

    def render_edit(
        self,
        h: int,
        w: int,
        camera_pose_Twc: np.ndarray,
        fovx_deg: float = 70,
        render_bg_only: bool = False,
        render_obj_only: bool = False,
        white_back: bool = False,
        chunk: int = 4096,
    ):
        focal = (w / 2) / np.tan((fovx_deg / 2) / (180 / np.pi))
        directions = get_ray_directions(h, w, focal)
        Twc = center_pose_from_avg(self.pose_avg, camera_pose_Twc)

        if render_bg_only:
            self.active_object_ids = [0]
        if render_obj_only:
            self.active_object_ids = [
                i for i in self.active_object_ids if i != 0
            ]

        obj_ids, rays_list = [], []
        processed = []
        for obj_id in self.active_object_ids:
            dup_cnt = int(np.sum(np.array(processed) == obj_id))
            if obj_id == 0:
                Tow = np.eye(4)
            else:
                object_pose = self.object_pose_transform[f"{obj_id}_{dup_cnt}"]
                Tow_orig = self.get_object_bbox_helper(
                    obj_id
                ).get_world_to_object_transform()
                # counter-transform the rays (editable_renderer.py:246-249)
                transform = np.linalg.inv(Tow_orig) @ object_pose @ Tow_orig
                Tow = np.linalg.inv(transform)
            processed.append(obj_id)
            Toc = Tow @ Twc
            Toc[:, 3] /= self.scale_factor
            rays_o, rays_d = get_rays(directions, Toc[:3, :4].astype(np.float32))
            rays_list.append(self.generate_rays(obj_id, rays_o, rays_d))
            obj_ids.append(obj_id)

        return self._render_multi(rays_list, obj_ids, white_back, chunk)

    def render_origin(self, h: int, w: int, camera_pose_Twc: np.ndarray,
                      fovx_deg: float = 70, chunk: int = 4096):
        focal = (w / 2) / np.tan((fovx_deg / 2) / (180 / np.pi))
        directions = get_ray_directions(h, w, focal)
        Twc = center_pose_from_avg(self.pose_avg, camera_pose_Twc)
        Twc[:, 3] /= self.scale_factor
        rays_o, rays_d = get_rays(directions, Twc[:3, :4].astype(np.float32))
        rays = self.generate_rays(0, rays_o, rays_d)
        return self._render_multi([rays], [0], False, chunk)
