"""The training system: jitted, mesh-sharded train/val steps + the fit loop.

Replaces the reference's PyTorch-Lightning `ObjectNeRFSystem`
(train.py:36-231) with a TPU-native design:

* one fully-jitted `train_step(state, batch, key)` — render, loss, grads,
  Adam/schedule update in a single XLA program, donated state;
* ray batches sharded over a 1-D `data` mesh (NamedSharding); parameters
  replicated; XLA inserts the gradient all-reduce over ICI — this is the
  DDP equivalent (train.py:261-262) with zero user-side collectives;
* the validation render is the same jitted program at eval settings,
  `lax.map`-chunked over whole-image ray tiles;
* voxel prune/subdivide hooks run between epochs on the host, mirroring
  `on_epoch_start` (train.py:140-145).

The *loss/metric names* match the reference logger keys (train/loss,
train/psnr, val/psnr, lr, ...) for comparability.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp import init_object_nerf
from ..models.code_library import init_code_library, lookup_codes
from ..models import voxel_grid as vg
from ..render.renderer import RenderSettings, render_rays
from ..parallel.mesh import make_mesh, data_sharding, replicate
from .losses import total_loss
from .metrics import psnr
from .optim import make_optimizer, make_lr_schedule


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def init_params(key, settings: RenderSettings, model_cfg, voxel_features=None):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "coarse": init_object_nerf(k1, settings.mlp),
        "code_library": init_code_library(
            k3,
            int(model_cfg.get("N_max_objs", 64)),
            int(model_cfg.get("N_obj_code_length", 64)),
        ),
    }
    if settings.N_importance > 0:
        params["fine"] = init_object_nerf(k2, settings.mlp)
    if voxel_features is not None:
        params["voxel_features"] = voxel_features
    return params


def _voxel_ctx(params, voxel_topo, voxel_static):
    if voxel_static is None:
        return None  # classical PE path
    return (params["voxel_features"], voxel_topo, voxel_static)


def make_train_step(
    settings: RenderSettings,
    loss_weights: Dict[str, float],
    optimizer: optax.GradientTransformation,
    voxel_static: Optional[vg.VoxelStatic] = None,
    lr_schedule=None,
    donate: bool = True,
):
    """Build the jitted train step.

    Returned signature: (state, batch, key, voxel_topo) -> (state, metrics).
    `voxel_topo` is a dynamic arg so pruning never recompiles.
    """

    use_instance = settings.forward_instance

    def loss_fn(params, batch, key, voxel_topo):
        voxel_ctx = _voxel_ctx(params, voxel_topo, voxel_static)
        codes = None
        if use_instance:
            codes = lookup_codes(params["code_library"], batch["instance_ids"])
        results = render_rays(
            params,
            batch["rays"],
            key,
            settings,
            voxel_ctx=voxel_ctx,
            embedding_instance=codes,
            pass_through_mask=batch.get("pass_through_mask"),
        )
        loss, logs = total_loss(results, batch, loss_weights, use_instance)
        typ = "fine" if settings.N_importance > 0 else "coarse"
        train_psnr = psnr(
            results[f"rgb_{typ}"], batch["rgbs"], batch["valid_mask"][:, None]
        )
        return loss, (logs, train_psnr)

    def train_step(state: TrainState, batch, key, voxel_topo):
        (loss, (logs, train_psnr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, key, voxel_topo)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"train/loss": loss, "train/psnr": train_psnr}
        metrics.update({f"train/{k}": v for k, v in logs.items()})
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_render_fn(
    settings: RenderSettings,
    voxel_static: Optional[vg.VoxelStatic] = None,
    chunk: int = 4096,
):
    """Whole-image eval renderer.

    One jitted program renders a fixed-size ray chunk; the wrapper loops
    over chunks with *async dispatch* (no host sync between chunks), so the
    device pipeline stays full and per-call dispatch latency overlaps with
    compute. Rays must be padded to a multiple of `chunk` by the caller.

    (A single `lax.map` over all chunks would be one dispatch, but programs
    above a few-chunk size currently trip an internal TPU-compiler error on
    this toolchain — the loop-of-jit form compiles reliably and benches
    within noise of the fused form.)
    """

    deterministic = settings.perturb == 0 and settings.noise_std == 0
    # the single-program fused fallback cannot route the rays_in_bbox
    # instance-weight pdf; the split stages can (and are the fast path)
    use_fused = (
        settings.use_pallas and not settings.rays_in_bbox and deterministic
    )

    # eval-only: the voxel corner table is a pure function of the (frozen)
    # features — build it ONCE per frame and thread it through every chunk
    # program instead of rebuilding (scatter + pad + 8-view concat + bf16
    # cast) inside each of the ~40 chunk jits
    prebuild_ct = None
    if (voxel_static is not None and settings.use_pallas
            and not vg._dense_path_ok(voxel_static)):
        print(
            f"WARNING: fast split-eval stages UNAVAILABLE — voxel grid "
            f"{voxel_static.shape} needs a "
            f"{vg.dense_table_bytes(voxel_static) / (1 << 30):.2f} GiB dense "
            f"corner table > "
            f"{vg.DENSE_CELL_TABLE_LIMIT_BYTES / (1 << 30):.0f} GiB limit; "
            f"rendering through the per-corner-gather program"
        )
    if voxel_static is not None and vg._dense_path_ok(voxel_static):
        lowp = settings.use_pallas and settings.pallas_dtype == "bfloat16"

        @jax.jit
        def prebuild_ct(params, voxel_topo):
            return vg.make_corner_table(
                params["voxel_features"], voxel_topo, voxel_static, lowp=lowp
            )

    # fused eval: split Pallas-kernel stages from everything else into
    # separate programs (XLA ops sharing a program with a large-VMEM
    # Pallas call run far slower — gathers 2-4×, even the classical pdf
    # glue ~3 ms/chunk; renderer.make_fused_eval_stages). Classical always
    # splits; voxel additionally needs the prebuilt corner table. The
    # stages also carry rays_in_bbox (instance-weight pdf) — only the
    # single-program fused fallback can't.
    split_chunk = None
    if (settings.use_pallas and deterministic
            and (voxel_static is None or prebuild_ct is not None)):
        from ..render.renderer import make_fused_eval_stages

        split_chunk = make_fused_eval_stages(settings, voxel_static)

    @functools.partial(jax.jit, static_argnames=())
    def render_chunk(params, rays_c, key, codes_c, voxel_topo, ct):
        voxel_ctx = _voxel_ctx(params, voxel_topo, voxel_static)
        if voxel_ctx is not None and ct is not None:
            voxel_ctx = voxel_ctx + (ct,)
        codes = codes_c if settings.forward_instance else None
        if use_fused:
            from ..render.renderer import render_rays_fused_eval

            return render_rays_fused_eval(
                params, rays_c, settings, voxel_ctx=voxel_ctx,
                embedding_instance=codes,
                interpret=settings.pallas_interpret,
            )
        out = render_rays(
            params, rays_c, key, settings,
            voxel_ctx=voxel_ctx,
            embedding_instance=codes,
        )
        # keep only the final-pass image maps: trimming per-sample outputs
        # saves bandwidth, and emitting coarse+fine maps together currently
        # trips an internal TPU-compiler error (regalloc) on this toolchain
        typ = "fine" if settings.N_importance > 0 else "coarse"
        keep = (f"rgb_{typ}", f"depth_{typ}", f"opacity_{typ}",
                f"rgb_instance_{typ}", f"depth_instance_{typ}",
                f"opacity_instance_{typ}")
        return {k: v for k, v in out.items() if k in keep}

    def render(params, rays, key, instance_ids, voxel_topo, put_chunk=None):
        """`put_chunk`, when given, places each chunk's ray/code slice
        (e.g. `jax.device_put` with a data sharding) so the per-chunk
        programs run SPMD over a multi-chip mesh — rays are embarrassingly
        parallel, so this is the whole multi-chip eval story. Single-chip
        callers leave it None and keep the device-slice fast path."""
        codes = None
        if settings.forward_instance:
            codes = lookup_codes(params["code_library"], instance_ids)
        ct = None
        if prebuild_ct is not None:
            ct = prebuild_ct(params, voxel_topo)
        n = rays.shape[0]
        outs = []
        for i in range(0, n, chunk):
            rays_c = rays[i : i + chunk]
            codes_c = codes[i : i + chunk] if codes is not None else None
            if put_chunk is not None:
                rays_c = put_chunk(rays_c)
                codes_c = put_chunk(codes_c) if codes_c is not None else None
            if split_chunk is not None:
                outs.append(
                    split_chunk(params, rays_c, codes_c, voxel_topo, ct)
                )
            else:
                outs.append(
                    render_chunk(params, rays_c, key, codes_c, voxel_topo,
                                 ct)
                )
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }

    return render


class ObjectNeRFSystem:
    """End-to-end trainer mirroring the reference system's public surface."""

    def __init__(self, config, dataset=None, val_dataset=None, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        self.use_voxel = bool(config.model.get("use_voxel_embedding", True))

        self.train_dataset = dataset
        self.val_dataset = val_dataset

        seed = int(config.train.get("seed", 42))
        self.key = jax.random.PRNGKey(seed)

        use_pallas = config.get("tpu", {}).get("use_pallas", "auto")
        if use_pallas == "auto":
            # fused kernels on real TPUs; XLA path elsewhere (CPU tests)
            use_pallas = jax.default_backend() == "tpu"
        # interpreter-mode kernels (CPU tests of the pallas routing)
        pallas_interpret = bool(
            config.get("tpu", {}).get("pallas_interpret", False)
        )
        pallas_kw = dict(pallas_interpret=pallas_interpret)
        if pallas_interpret:
            pallas_kw["pallas_dtype"] = "float32"
        if self.n_devices > 1:
            # >1-device mesh: Pallas launches shard_map their ray axis over
            # it (GSPMD can't partition tpu_custom_call); the bwd kernel
            # psums weight grads — the DDP all-reduce (train.py:261-262)
            pallas_kw["shard_mesh"] = self.mesh
        def _in_bbox(ds):
            # bbox-bounded training routes instance weights into fine
            # sampling (reference train.py:156-160 → rendering.py:228-229)
            return bool(getattr(ds, "is_rays_in_bbox", lambda: False)())

        self.settings = RenderSettings.from_config(
            config, white_back=getattr(dataset, "white_back", False),
            is_eval=False, use_pallas=bool(use_pallas),
            rays_in_bbox=_in_bbox(dataset), **pallas_kw,
        )
        self.eval_settings = RenderSettings.from_config(
            config,
            white_back=getattr(val_dataset or dataset, "white_back", False),
            is_eval=True,
            use_pallas=bool(use_pallas),
            rays_in_bbox=_in_bbox(val_dataset or dataset), **pallas_kw,
        )

        # voxel grid
        self.voxel_topo = None
        self.voxel_static = None
        voxel_features = None
        if self.use_voxel:
            from ..data.ply_io import read_ply

            pcd = read_ply(config.dataset_extra.pcd_path)["points"]
            self.key, vk = jax.random.split(self.key)
            voxel_features, self.voxel_topo, self.voxel_static = (
                vg.build_voxel_grid_from_config(pcd, config, key=vk)
            )

        self.key, pk = jax.random.split(self.key)
        params = init_params(pk, self.settings, config.model, voxel_features)

        batch_size = int(config.train.batch_size)
        if dataset is not None:
            steps_per_epoch = max(1, self._steps_per_epoch(dataset, batch_size))
        else:
            steps_per_epoch = 1000
        self.steps_per_epoch = steps_per_epoch
        self.optimizer = make_optimizer(config.train, steps_per_epoch)
        self.lr_schedule = make_lr_schedule(config.train, steps_per_epoch)

        opt_state = self.optimizer.init(params)
        state = TrainState(params, opt_state, jnp.int32(0))

        # resume (train.py:258 resume_from_checkpoint semantics): ckpt_path
        # may be an Orbax dir of ours or a reference Lightning .ckpt
        ckpt_path = config.get("ckpt_path")
        if ckpt_path:
            state = self._restore(state, ckpt_path)

        self.state = replicate(state, self.mesh)
        if self.voxel_topo is not None:
            self.voxel_topo = replicate(self.voxel_topo, self.mesh)

        self.train_step = self._build_train_step()
        self._render_fns: Dict[int, Any] = {}
        self.batch_sharding = data_sharding(self.mesh)

    def _build_train_step(self):
        """Construct the jitted train step against the CURRENT voxel_static
        (called at init and again after subdivision changes the grid).

        Split-program train step (kernel-only XLA programs, the TPU fast
        path — train/split_step.py): "auto" enables it on real TPUs for
        the shapes it covers; the monolithic jitted step remains the
        reference implementation and the fallback."""
        from .split_step import make_split_train_step, split_step_supported

        config = self.config
        split_cfg = config.get("tpu", {}).get("split_train_step", "auto")
        supported = split_step_supported(self.settings, self.voxel_static)
        use_split = supported
        if split_cfg == "auto":
            use_split = use_split and jax.default_backend() == "tpu"
        else:
            use_split = use_split and bool(split_cfg)
        if self.settings.use_pallas and not supported:
            # NEVER lose the fast path silently (a mid-run subdivision can
            # flip this): say exactly why the slower monolithic step runs
            if self.settings.N_importance <= 0:
                why = "N_importance=0 (no hierarchical fine pass)"
            else:
                gib = vg.dense_table_bytes(self.voxel_static) / (1 << 30)
                why = (
                    f"voxel grid {self.voxel_static.shape} needs a "
                    f"{gib:.2f} GiB dense corner table > "
                    f"{vg.DENSE_CELL_TABLE_LIMIT_BYTES / (1 << 30):.0f} GiB "
                    f"limit (models/voxel_grid.DENSE_CELL_TABLE_LIMIT_BYTES)"
                )
            print(
                f"WARNING: split-program train step UNAVAILABLE — {why}; "
                f"falling back to the monolithic step (slower dispatch "
                f"pipeline)"
            )
        # observability (bench.py reports these so the driver record can
        # tell code regressions from tunnel dispatch-latency drift): which
        # step implementation is live and how many XLA programs one step
        # dispatches (split = 8, monolithic = 1 — split_step.py docstring)
        self.train_step_kind = "split" if use_split else "monolithic"
        donate = bool(config.get("tpu", {}).get("donate_train_state", True))
        if use_split:
            # merged backward (default): fine+coarse bwd kernels share one
            # program — measured neutral-to-better on-chip and one fewer
            # dispatch under tunnel drift (split_step.make_split_train_step)
            merge_bwd = bool(config.get("tpu", {}).get("merge_bwd", True))
            self.train_programs_per_step = 7 if merge_bwd else 8
            return make_split_train_step(
                self.settings, dict(config.loss), self.optimizer,
                self.voxel_static, self.lr_schedule, donate=donate,
                merge_bwd=merge_bwd,
            )
        self.train_programs_per_step = 1
        return make_train_step(
            self.settings, dict(config.loss), self.optimizer,
            self.voxel_static, self.lr_schedule, donate=donate,
        )

    def _restore(self, state: TrainState, ckpt_path) -> TrainState:
        from .checkpoint import load_any_checkpoint

        restored = load_any_checkpoint(ckpt_path, self.config.model)
        params = restored["params"]
        # keep freshly-initialized leaves for anything the ckpt lacks
        merged = dict(state.params)
        merged.update(params)
        if restored.get("voxel_torch") is not None:
            # a reference voxel checkpoint carries its own topology buffers;
            # adopt them wholesale (table rows are indexed by that idx map)
            feats, self.voxel_topo, self.voxel_static = vg.from_torch_buffers(
                restored["voxel_torch"], int(self.config.model.N_freq_voxel)
            )
            merged["voxel_features"] = feats
        step = jnp.int32(restored.get("step", 0))
        opt_state = restored.get("opt_state")
        if opt_state is None:
            opt_state = self.optimizer.init(merged)
        else:
            # restored leaves are raw arrays; rebuild the optax pytree
            treedef = jax.tree_util.tree_structure(self.optimizer.init(merged))
            leaves = jax.tree_util.tree_leaves(opt_state)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        if restored.get("voxel_topo") is not None and self.voxel_topo is not None:
            self.voxel_topo = vg.topology_from_dict(
                restored["voxel_topo"],
                capacity=int(merged["voxel_features"].shape[0]),
            )
        print(f"resumed from {ckpt_path} at step {int(step)}")
        return TrainState(merged, opt_state, step)

    def _steps_per_epoch(self, dataset, batch_size) -> int:
        limit = self.config.train.get("limit_train_batches", 1.0)
        full = max(1, len(dataset) // batch_size)
        if limit is None:
            return full
        if isinstance(limit, float) and limit <= 1.0:
            return max(1, int(full * limit))
        return min(full, int(limit))

    # -- data movement -------------------------------------------------------
    def _device_batch(self, np_batch):
        batch = {
            k: jnp.asarray(v) for k, v in np_batch.items()
        }
        return jax.device_put(batch, self.batch_sharding)

    # -- public API -----------------------------------------------------------
    def training_step(self, np_batch):
        self.key, sub = jax.random.split(self.key)
        batch = self._device_batch(np_batch)
        self.state, metrics = self.train_step(
            self.state, batch, sub, self.voxel_topo
        )
        return metrics

    def render_image(self, np_batch, chunk: int = 4096):
        """Render a whole-image batch at eval settings; returns host arrays."""
        rays = np.asarray(np_batch["rays"], np.float32)
        ids = np.asarray(np_batch["instance_ids"], np.int64)
        n = len(rays)
        chunk = min(chunk, n)
        pad = (-n) % chunk
        if pad:
            rays = np.concatenate([rays, np.repeat(rays[-1:], pad, 0)])
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
        if chunk not in self._render_fns:
            self._render_fns[chunk] = make_render_fn(
                self.eval_settings, self.voxel_static, chunk
            )
        self.key, sub = jax.random.split(self.key)
        # multi-chip: shard each chunk's rays over the data mesh so the
        # chunk programs run SPMD (params are already replicated). The XLA
        # pipeline partitions under GSPMD; Pallas kernel launches shard_map
        # themselves over eval_settings.shard_mesh (ops/pallas_mlp.
        # shard_over_rays), so every path scales over the mesh. Single chip
        # keeps the device-slice fast path.
        put_chunk = None
        if self.n_devices > 1 and chunk % self.n_devices == 0:
            # device_put reshards the device-sliced chunk directly
            # (device->devices scatter, no host round-trip)
            put_chunk = lambda x: jax.device_put(x, self.batch_sharding)  # noqa: E731
        out = self._render_fns[chunk](
            self.state.params, jnp.asarray(rays), sub, jnp.asarray(ids),
            self.voxel_topo, put_chunk=put_chunk,
        )
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def validation(self, frame: int = 0, chunk: int = 4096,
                   img_wh: Optional[tuple] = None):
        batch = self.val_dataset.whole_image_batch(frame)
        out = self.render_image(batch, chunk)
        typ = "fine" if self.eval_settings.N_importance > 0 else "coarse"
        mask = batch["valid_mask"]
        if "instance_mask" in batch:
            mask = mask * np.asarray(batch["instance_mask"], bool)
        val_psnr = float(
            psnr(
                jnp.asarray(out[f"rgb_{typ}"]),
                jnp.asarray(batch["rgbs"]),
                jnp.asarray(mask)[:, None],
            )
        )
        metrics = {"val/psnr": val_psnr}
        img_wh = img_wh or getattr(self.val_dataset, "img_wh", None)
        if img_wh is not None:
            from .metrics import ssim

            w, h = img_wh
            metrics["val/ssim"] = float(
                ssim(
                    jnp.asarray(out[f"rgb_{typ}"]).reshape(h, w, 3),
                    jnp.asarray(batch["rgbs"]).reshape(h, w, 3),
                )
            )
        # stash for val-image logging (the reference logs a 7-panel image
        # stack per validation, train.py:212-218 via train_helper.py:24-55);
        # consumers call val_image_panel() to build it lazily
        self._last_val = (img_wh, batch, out, typ)
        return metrics, out

    def val_image_panel(self):
        """(N_panels, H, W, 3) visualization stack of the last validation
        (GT rgb | instance rgb | full rgb | instance depth | depth |
        GT depth | instance opacity) — the reference's val/GT_pred_depth
        image (utils/train_helper.py:24-55). None before any validation."""
        if getattr(self, "_last_val", None) is None:
            return None
        from ..utils.train_helper import visualize_val_image

        img_wh, batch, out, typ = self._last_val
        if img_wh is None:
            return None
        return visualize_val_image(img_wh, batch, out, typ=typ)

    def on_epoch_start(self, epoch: int):
        """Progressive voxel training hooks (train.py:140-145)."""
        if not (
            self.config.train.get("progressive_train", False) and self.use_voxel
        ):
            return
        from ..models.mlp import scene_forward

        params = self.state.params

        def sigma_fn(emb_xyz):
            s, _ = scene_forward(
                params.get("fine", params["coarse"]), self.settings.mlp,
                emb_xyz, None, sigma_only=True,
            )
            return s

        if epoch > 2:
            self.key, sub = jax.random.split(self.key)
            self.voxel_topo = vg.prune_empty_voxels(
                params["voxel_features"], self.voxel_topo, self.voxel_static,
                sigma_fn, sub,
                samples_per_voxel=int(
                    self.config.train.get("prune_samples_per_voxel", 16**3)
                ),
                voxel_batch=int(self.config.train.get("prune_voxel_batch", 256)),
            )
        if epoch == 5:
            feats, self.voxel_topo, self.voxel_static = vg.subdivide_voxels(
                params["voxel_features"], self.voxel_topo, self.voxel_static
            )
            new_params = dict(params)
            new_params["voxel_features"] = feats
            # subdivision changes only the voxel feature table's shape:
            # graft the live Adam moments for every other leaf into a fresh
            # optax state so MLP/code-library training is undisturbed (the
            # reference's in-place embedding swap keeps its optimizer state)
            fresh = self.optimizer.init(new_params)
            opt_state = jax.tree_util.tree_map(
                lambda f, o: o
                if getattr(f, "shape", None) == getattr(o, "shape", ())
                else f,
                fresh,
                self.state.opt_state,
            )
            self.state = replicate(
                TrainState(new_params, opt_state, self.state.step), self.mesh
            )
            self.train_step = self._build_train_step()
            self._render_fns.clear()

    def fit(self, callbacks=None, rng=None, epoch_end_callbacks=None):
        """The Lightning-free training loop.

        `callbacks` fire after each validation: cb(epoch, it, metrics, self).
        `epoch_end_callbacks` fire once per epoch after its last step:
        cb(epoch, self) — the train CLI hangs the reference's per-epoch
        checkpointing (train.py:241-251, save_on_train_epoch_end) here.

        Aux hooks (SURVEY §5 parity): `tpu.profile_dir` captures a
        jax.profiler trace of the first post-compile steps;
        `train.nan_guard` (default on) aborts with a clear message if the
        loss goes non-finite (the reference has no equivalent — NaNs there
        poison training silently). The guard is checked every
        `train.nan_check_every` steps (default 50) INDEPENDENT of any
        validation dataset — a val-less run still aborts within one check
        window. Each check is one host fetch of an already-computed device
        scalar, so the async dispatch pipeline only syncs at that cadence."""
        import time

        callbacks = callbacks or []
        rng = rng or np.random.RandomState(int(self.config.train.get("seed", 42)))
        batch_size = int(self.config.train.batch_size)
        num_epochs = int(self.config.train.num_epochs)
        val_every = float(self.config.train.get("val_check_interval", 0.25))
        val_interval = max(1, int(self.steps_per_epoch * val_every))
        nan_guard = bool(self.config.train.get("nan_guard", True))
        nan_check_every = max(
            1, int(self.config.train.get("nan_check_every", 50))
        )

        def _check_finite(loss_value, epoch, it):
            if nan_guard and not np.isfinite(float(loss_value)):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} it {it} — lower "
                    f"train.lr or enable model.noise_std"
                )
        profile_dir = self.config.get("tpu", {}).get("profile_dir")
        profile_steps = int(self.config.get("tpu", {}).get("profile_steps", 5))
        profiling = False

        history = []
        global_it = 0
        for epoch in range(num_epochs):
            self.on_epoch_start(epoch)
            t0 = time.time()
            for it in range(self.steps_per_epoch):
                if profile_dir and global_it == 2 and not profiling:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                np_batch = self.train_dataset.sample_batch(batch_size, rng)
                metrics = self.training_step(np_batch)
                global_it += 1
                if profiling and global_it >= 2 + profile_steps:
                    jax.block_until_ready(metrics["train/loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {profile_dir}")
                if nan_guard and global_it % nan_check_every == 0:
                    # the host fetch is the sync point; skip it entirely
                    # when the guard is off so the dispatch stream stays
                    # asynchronous (each fetch costs a ~25 ms tunnel
                    # round-trip on axon)
                    _check_finite(
                        jax.device_get(metrics["train/loss"]), epoch, it
                    )
                if (it + 1) % val_interval == 0 and self.val_dataset is not None:
                    val_metrics, _ = self.validation()
                    metrics = {**jax.device_get(metrics), **val_metrics}
                    _check_finite(metrics["train/loss"], epoch, it)
                    history.append(metrics)
                    for cb in callbacks:
                        cb(epoch, it, metrics, self)
            dt = time.time() - t0  # epoch timing excludes ckpt writes
            for cb in (epoch_end_callbacks or []):
                cb(epoch, self)
            rays_per_sec = self.steps_per_epoch * batch_size / dt
            m = jax.device_get(metrics)
            print(
                f"epoch {epoch}: loss={float(m['train/loss']):.4f} "
                f"psnr={float(m['train/psnr']):.2f} "
                f"({rays_per_sec:,.0f} rays/s)"
            )
        return history
