"""object_nerf_tpu: TPU-native object-compositional NeRF framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of zju3dv/object_nerf
(ICCV 2021, "Learning Object-Compositional Neural Radiance Field for Editable
Scene Rendering"): a two-branch NeRF (scene + per-object latent-code branch),
sparse voxel feature conditioning, instance-mask supervision, hierarchical
importance sampling, and an editable renderer (move / rotate / duplicate /
remove objects) — all with static shapes, explicit PRNG keys, and ray batches
sharded over a `jax.sharding.Mesh`.

Layer map (mirrors reference SURVEY.md §1):
  config/    — layered YAML config (same schema as reference config/*.yml)
  data/      — ray generation, datasets, geometry utilities
  models/    — positional encodings, voxel grid, NeRF MLPs, code library
  ops/       — sampling + compositing primitives, Pallas kernels
  render/    — render_rays / render_rays_multi pipelines
  parallel/  — device mesh + sharding helpers
  train/     — losses, metrics, optimizer, train loop, checkpointing
  edit/      — editable renderer + bbox helpers
"""

__version__ = "0.1.0"
