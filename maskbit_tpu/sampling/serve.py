"""Pod-scale sampling: shard the generation batch over the device mesh.

The 50k-sample gFID eval is embarrassingly parallel over the batch axis —
the real parallel work in this system (SURVEY §5 long-context note). This
wraps the single-program sampler with data-axis sharding so one jit
generates on every chip of a slice simultaneously; eval moments are summed
on host (they are plain sums, see eval/fid.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from maskbit_tpu.parallel.mesh import batch_sharding, global_batch_array, replicated
from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler


def make_sharded_sampler(
    generator,
    tokenizer,
    cfg: SamplingConfig,
    mesh,
) -> Callable:
    """images = f(gen_vars, tok_vars, key, labels) with labels/images sharded
    on the mesh's data axis; weights replicated. Call with a labels batch
    divisible by the data-axis size."""
    inner = make_sampler(generator, tokenizer, cfg, jit=False)

    sampler = jax.jit(
        lambda gv, tv, key, labels: inner(gv, tv, key, labels)[0],
        in_shardings=(replicated(mesh), replicated(mesh), replicated(mesh),
                      batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )

    def run(gen_vars, tok_vars, key: jax.Array, labels: jnp.ndarray):
        # multi-process-safe: each host contributes its local label slice
        labels = global_batch_array(jnp.asarray(labels, jnp.int32), mesh)
        # enter the mesh context so the Pallas attention kernels can
        # self-partition over the batch axes (nn/pallas_attention._kernel_mesh
        # — GSPMD alone cannot partition an opaque Mosaic call)
        with mesh:
            return sampler(gen_vars, tok_vars, key, labels)

    return run
