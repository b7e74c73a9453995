"""Worker for REAL multi-process distributed tests.

Spawned by tests/test_multiprocess.py — N processes, each with 2 virtual CPU
devices, joined through `jax.distributed.initialize` (Gloo collectives).
This executes the code paths that single-process tests can never reach:
cross-process grad reduction, `process_allgather`-based evaluator merges,
`sync_global_devices`, and the per-host data split — the contract the
reference gets from `accelerate launch`
(reference scripts/train_tokenizer.py:61-67, 374, 416, 482).

Writes a JSON result file per process; hard-asserts internally so any
failure surfaces as a nonzero exit code.
"""

import json
import os
import sys
from functools import partial


def scalar(x) -> float:
    """Read a replicated global-array scalar on this host."""
    import numpy as np

    return float(np.asarray(x.addressable_data(0)))


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    from maskbit_tpu.parallel.mesh import (
        MeshConfig,
        barrier,
        create_mesh,
        global_batch_array,
        replicated,
        warmup_collective_rendezvous,
    )

    results = {"pid": pid, "nproc": nproc}

    # (e) cross-host barrier ---------------------------------------------------
    barrier("mp-test")
    results["barrier"] = True

    mesh = create_mesh(MeshConfig())  # (2*nproc, 1, 1)
    assert mesh.devices.size == 2 * nproc
    # form the Gloo cliques while skew is import-bounded (30 s hard window)
    warmup_collective_rendezvous(mesh)

    # --- deterministic global batch; every process holds the full copy, the
    # distributed path feeds only its contiguous per-host slice ---------------
    rng = np.random.default_rng(7)
    global_b = 4 * nproc
    tokens_full = rng.integers(0, 64, size=(global_b, 16)).astype(np.int32)
    labels_full = rng.integers(0, 10, size=(global_b,)).astype(np.int32)
    per = global_b // nproc
    tokens_local = tokens_full[pid * per : (pid + 1) * per]
    labels_local = labels_full[pid * per : (pid + 1) * per]

    tokens_g = global_batch_array(tokens_local, mesh)
    labels_g = global_batch_array(labels_local, mesh)

    # row-placement check: global row i of the assembled array must be row i
    # of the full batch (the loss below is not permutation-invariant)
    @partial(jax.jit, out_shardings=replicated(mesh))
    def rowsums(x):
        return jnp.sum(x, axis=tuple(range(1, x.ndim)))

    got = np.asarray(rowsums(tokens_g).addressable_data(0))
    want = tokens_full.sum(axis=1)
    assert np.array_equal(got, want), (got, want)
    results["row_placement"] = True

    # (a) REAL sharded train step with cross-process grad reduction -----------
    import optax

    from maskbit_tpu.losses.mlm import MLMLossConfig
    from maskbit_tpu.models.generator import LFQBert
    from maskbit_tpu.train.generator_trainer import (
        init_generator_train_state,
        make_generator_train_step_from_tokens,
    )

    generator = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=64, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=4,
    )
    tx = optax.adam(1e-3)
    state = init_generator_train_state(generator, tx, jax.random.key(0), use_ema=False)
    step_fn = make_generator_train_step_from_tokens(
        generator, 64, tx, MLMLossConfig(), class_label_dropout=0.0
    )
    key = jax.random.key(3)

    # single-process truth: full batch on this host's local device
    _, metrics_local = jax.jit(step_fn)(state, jnp.asarray(tokens_full),
                                        jnp.asarray(labels_full), key)
    loss_local = float(metrics_local["mlm_loss"])

    # distributed: params/opt replicated over the global mesh, batch sharded;
    # GSPMD inserts the cross-process grad psum
    with mesh:
        state_g = jax.device_put(jax.tree.map(np.asarray, state), replicated(mesh))
        new_state, metrics = jax.jit(step_fn)(state_g, tokens_g, labels_g, key)
        jax.block_until_ready(new_state.params)
    loss_dist = scalar(metrics["mlm_loss"])
    results["loss_local"] = loss_local
    results["loss_dist"] = loss_dist
    assert abs(loss_dist - loss_local) < 1e-4, (loss_dist, loss_local)

    # updated params must match the single-process update (grad reduction is
    # exact, not per-host)
    leaf_local = jax.tree.leaves(jax.jit(step_fn)(state, jnp.asarray(tokens_full),
                                                  jnp.asarray(labels_full), key)[0].params)[0]
    leaf_dist = np.asarray(jax.tree.leaves(new_state.params)[0].addressable_data(0))
    assert np.allclose(leaf_dist, np.asarray(leaf_local), atol=1e-5)
    results["grad_reduction"] = True

    # (b) TokenizerEvaluator.merge_across_hosts == single-host full batch -----
    from maskbit_tpu.eval.streaming import TokenizerEvaluator

    n_imgs = 2 * nproc
    real = rng.uniform(size=(n_imgs, 16, 16, 3)).astype(np.float32)
    fake = np.clip(real + rng.normal(scale=0.05, size=real.shape), 0, 1).astype(np.float32)
    codes = rng.integers(0, 32, size=(n_imgs, 16)).astype(np.int64)

    kwargs = dict(
        enable_psnr_score=True, enable_ssim_score=True, enable_mse_error=True,
        enable_mae_error=True, enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True, num_codebook_entries=32,
    )
    ev = TokenizerEvaluator(**kwargs)
    sl = slice(pid, None, nproc)  # strided per-host split
    ev.update(real[sl], fake[sl], codes[sl])
    ev.merge_across_hosts()
    merged = dict(ev.result())

    ev_full = TokenizerEvaluator(**kwargs)
    ev_full.update(real, fake, codes)
    full = dict(ev_full.result())
    results["evaluator_merged"] = merged
    results["evaluator_full"] = full
    for k in full:
        assert abs(merged[k] - full[k]) < 1e-6, (k, merged[k], full[k])

    # (c) AdmMomentAccumulator partial-merge across processes ------------------
    from maskbit_tpu.eval.adm import AdmMomentAccumulator

    total, dim, nclass, split = 8 * nproc, 6, 5, 4
    acts = rng.normal(size=(total, dim))
    logits = rng.normal(size=(total, nclass))

    acc = AdmMomentAccumulator(dim=dim, nclass=nclass, total_samples=total, split_size=split)
    idx = np.arange(total)[sl]
    acc.update(acts[sl], logits[sl], idx)
    acc.merge_across_hosts()

    acc_full = AdmMomentAccumulator(dim=dim, nclass=nclass, total_samples=total, split_size=split)
    acc_full.update(acts, logits, np.arange(total))

    s_m, s_f = acc.fid_statistics(), acc_full.fid_statistics()
    assert np.allclose(s_m.mu, s_f.mu, atol=1e-12)
    assert np.allclose(s_m.sigma, s_f.sigma, atol=1e-12)
    is_m, is_f = acc.inception_score(), acc_full.inception_score()
    results["adm_is_merged"] = is_m
    results["adm_is_full"] = is_f
    assert abs(is_m - is_f) < 1e-10

    # (d) per-host tar-shard split: disjoint + covering -----------------------
    from maskbit_tpu.data.tar_reader import TarImageDataset

    shard_dir = os.path.join(outdir, "shards")
    pattern = os.path.join(shard_dir, "shard-*.tar")
    ds = TarImageDataset(
        pattern, transform=None, resample=False,
        process_index=pid, process_count=nproc,
    )
    results["my_shards"] = sorted(os.path.basename(s) for s in ds._shard_iterator())

    barrier("mp-test-done")
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(results, f)
    print(f"worker {pid}: all checks passed", flush=True)


if __name__ == "__main__":
    main()
