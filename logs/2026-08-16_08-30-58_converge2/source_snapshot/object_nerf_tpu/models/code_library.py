"""Per-object latent code table.

Parity with the reference `CodeLibrary` (models/code_library.py:5-28): an
`(N_max_objs, N_obj_code_length)` embedding table looked up by instance id.
Here it is a plain array in the param pytree; lookup is a `take` (gather),
which XLA lowers to an efficient dynamic-gather on TPU.

Init matches torch.nn.Embedding's default N(0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_code_library(key, n_max_objs: int = 64, code_length: int = 64) -> jnp.ndarray:
    return jax.random.normal(key, (n_max_objs, code_length), jnp.float32)


def lookup_codes(table: jnp.ndarray, instance_ids: jnp.ndarray) -> jnp.ndarray:
    """instance_ids: (N,) int -> (N, code_length) latent codes."""
    return jnp.take(table, instance_ids.astype(jnp.int32), axis=0)
