"""Per-program breakdown of the split train step (train/split_step.py).

Times the whole step (classical and voxel) and then each of its eight
programs standalone with pipelined dispatch, on the bench scene at the
bench batch (2048 rays, 64+64). The sum of standalone program times
should roughly match the whole step (device programs execute serially);
the gap between classical and voxel steps decomposes into the P1/P3
gather programs and the P8 table-grad segment-sum.

Usage: python scripts/profile_split_train.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_voxel_render import timeit  # noqa: E402


def make_system(cfg, use_voxel):
    import tempfile

    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.data.ply_io import write_ply
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    cfg = cfg.copy()
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0,
                                 scene_center=[0.0, 0.0, 0.0]))
    cfg.train.batch_size = 2048
    cfg.model.use_voxel_embedding = use_voxel
    if use_voxel:
        rng = np.random.RandomState(0)
        pts = [rng.rand(8000, 3) * [2.4, 2.4, 0.0] - [1.2, 1.2, 0.0]]
        for c, r in ([[0.3, 0.0, 0.25], 0.25], [[-0.35, 0.2, 0.2], 0.2]):
            d = rng.randn(6000, 3)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            pts.append(np.asarray(c) + r * d)
        td = tempfile.mkdtemp()
        pcd = f"{td}/scene.ply"
        write_ply(pcd, np.concatenate(pts).astype(np.float32))
        cfg.dataset_extra.merge(dict(pcd_path=pcd, voxel_size=0.1,
                                     neighbor_marks=3))
    ds = SyntheticDataset("train", img_wh=(64, 48), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    return ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None), ds


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.train import split_step as ss

    cfg = load_config()
    for use_voxel in (False, True):
        tag = "voxel" if use_voxel else "classical"
        system, ds = make_system(cfg, use_voxel)
        rng = np.random.RandomState(0)
        np_batch = ds.sample_batch(2048, rng)
        batch = system._device_batch(np_batch)

        # whole step through the system (async dispatch, fetch loss)
        def whole():
            m = system.training_step(np_batch)
            return m["train/loss"]

        t_all = timeit(whole, iters=20)
        print(f"[{tag}] whole step: {t_all:7.2f} ms "
              f"({2048 / t_all * 1000:,.0f} rays/s)", flush=True)

        # rebuild the same split step to reach into its programs
        maker = ss.make_split_train_step(
            system.settings, dict(system.config.loss), system.optimizer,
            system.voxel_static, system.lr_schedule, donate=False,
        )
        # one full dispatch to compile everything
        state = system.state
        key = jax.random.PRNGKey(7)
        new_state, m = maker(state, batch, key, system.voxel_topo)
        float(np.asarray(m["train/loss"]))

        # The step's programs (7 with the default merged backward) are
        # closure-jitted inside
        # make_split_train_step and not reachable from outside, so the
        # breakdown is: whole step vs a standalone chain of the four
        # kernel programs at the step's exact shapes — the difference is
        # the four kernel-free glue programs (prep/gather, pdf+gather,
        # loss grad, table-grad+Adam).
        p = state.params
        fwd_kernel, bwd_kernel = ss.make_fused_fwd_bwd(
            system.settings.mlp, system.settings.forward_instance,
            dtype=jnp.bfloat16,
        )

        s_c = system.settings.N_samples
        s_f = s_c + system.settings.N_importance
        n = batch["rays"].shape[0]
        xyz_c = jnp.zeros((n, s_c, 3), jnp.float32)
        xyz_f = jnp.zeros((n, s_f, 3), jnp.float32)
        dir_pe = jnp.zeros((n, 27), jnp.float32)
        codes = jnp.zeros(
            (n, system.settings.mlp.N_obj_code_length), jnp.float32
        )
        cvox = system.settings.mlp.N_scn_voxel_size + \
            system.settings.mlp.N_obj_voxel_size
        vox_c = jnp.zeros((n, s_c, cvox), jnp.float32) if use_voxel else None
        vox_f = jnp.zeros((n, s_f, cvox), jnp.float32) if use_voxel else None
        g_c = jnp.zeros((n * s_c, 8), jnp.float32)
        g_f = jnp.zeros((n * s_f, 8), jnp.float32)

        jfwd = jax.jit(fwd_kernel)
        jbwd = jax.jit(bwd_kernel)

        def kernels_only():
            oc = jfwd(p["coarse"], xyz_c, dir_pe, codes, vox_c)
            of = jfwd(p["fine"], xyz_f, dir_pe, codes, vox_f)
            df, _, _ = jbwd(p["fine"], xyz_f, dir_pe, codes, vox_f, g_f)
            dc, _, _ = jbwd(p["coarse"], xyz_c, dir_pe, codes, vox_c, g_c)
            return dc["scene"]["trunk"][0]["w"]

        t_k = timeit(kernels_only, iters=20)
        print(f"[{tag}] 4 kernel programs alone: {t_k:7.2f} ms "
              f"(non-kernel share of step: {t_all - t_k:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
