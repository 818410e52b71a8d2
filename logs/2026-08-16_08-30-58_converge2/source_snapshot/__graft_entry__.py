"""Driver entry points: single-chip compile check + multi-chip dry run.

`entry()` returns a jittable eval-render forward step on the flagship model
(full-size two-branch ObjectNeRF, 64+64 hierarchical samples, instance
branch on). `dryrun_multichip(n)` builds an n-device data mesh, jits the
FULL training step with the real batch sharding + replicated params, and
executes one step on tiny shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _flagship_config():
    from object_nerf_tpu.config import load_config

    cfg = load_config()
    # classical-PE flagship path; voxel grid is exercised by its own tests
    cfg.model.use_voxel_embedding = False
    return cfg


def _example_rays(n):
    rng = np.random.RandomState(0)
    o = rng.randn(n, 3).astype(np.float32) * 0.1
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 0.5, np.float32)
    far = np.full((n, 1), 4.0, np.float32)
    return np.concatenate([o, d, near, far], -1)


def entry():
    """(fn, example_args) — jittable forward (eval render) step."""
    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.models.code_library import lookup_codes
    from object_nerf_tpu.render.renderer import RenderSettings, render_rays
    from object_nerf_tpu.train.system import init_params

    cfg = _flagship_config()
    settings = RenderSettings.from_config(cfg, is_eval=True)
    params = init_params(jax.random.PRNGKey(0), settings, cfg.model)

    n = 1024
    rays = jnp.asarray(_example_rays(n))
    instance_ids = jnp.zeros((n,), jnp.int32)
    key = jax.random.PRNGKey(1)

    def forward(params, rays, key, instance_ids):
        codes = lookup_codes(params["code_library"], instance_ids)
        out = render_rays(
            params, rays, key, settings, embedding_instance=codes,
        )
        return out["rgb_fine"], out["depth_fine"], out["opacity_instance_fine"]

    return forward, (params, rays, key, instance_ids)


def dryrun_multichip(n_devices: int) -> None:
    """Jit + run ONE full training step over an n-device data mesh."""
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    from jax.sharding import Mesh
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    cfg = load_config()
    cfg.model.merge(
        dict(use_voxel_embedding=False, D=2, W=32, skips=[1], inst_D=2,
             inst_W=16, inst_skips=[1], N_samples=8, N_importance=4,
             N_max_objs=8, N_obj_code_length=8)
    )
    cfg.train.merge(dict(batch_size=16 * n_devices))
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0))

    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)

    mesh = Mesh(np.asarray(devices), ("data",))
    system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None, mesh=mesh)

    batch = ds.sample_batch(16 * n_devices)
    metrics = system.training_step(batch)
    loss = float(jax.device_get(metrics["train/loss"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"
    shard_shapes = {
        s.data.shape
        for s in system._device_batch(batch)["rays"].addressable_shards
    }
    assert shard_shapes == {(16, 8)}, shard_shapes
    print(f"dryrun_multichip({n_devices}): OK, loss={loss:.4f}")


if __name__ == "__main__":
    fn, args = entry()
    out = jax.jit(fn)(*args)
    print("entry OK:", [o.shape for o in out])
