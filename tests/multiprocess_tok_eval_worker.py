"""Worker: merged in-train tokenizer eval under multi-process jax.distributed.

VERDICT r4 #4: `cli/train_tokenizer._eval_reconstruction` must merge the
streaming accumulators across hosts before `result()` — otherwise a pod logs
only host 0's eval-shard slice and undercounts codebook usage. Each host
evaluates a DISJOINT strided share of a deterministic global batch sequence;
the merged result must equal a single-host run over ALL batches.
"""

import json
import os
import sys
from types import SimpleNamespace


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    workspace = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    from maskbit_tpu.cli.train_tokenizer import _eval_reconstruction
    from maskbit_tpu.core.config import Config
    from maskbit_tpu.eval.streaming import TokenizerEvaluator
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.parallel.mesh import warmup_collective_rendezvous

    # form the Gloo cliques while skew is import-bounded (30 s hard window)
    warmup_collective_rendezvous()

    vq_cfg = {
        "model_class": "vqgan+", "quantizer_type": "lookup-free",
        "codebook_size": 16, "token_size": 4, "commitment_cost": 0.25,
        "entropy_loss_weight": 0.0, "num_channels": 3, "hidden_channels": 32,
        "channel_mult": [1, 2], "num_resolutions": 2, "num_res_blocks": 1,
        "sample_with_conv": True,
    }
    config = Config({"model": {"vq_model": vq_cfg},
                     "eval": {"max_eval_batches": 0}})
    model = ConvVQModel.from_config(config.model.vq_model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    # minimal stand-in for the train state: _eval_reconstruction only reads
    # _eval_params(state) = state.ema.params / state.gen_params
    state = SimpleNamespace(gen_params=variables["params"], ema=None)

    NB, BS = 4, 2  # 4 deterministic global batches, 2 per host

    def batch(i):
        key = jax.random.fold_in(jax.random.key(7), i)
        return {"image": np.asarray(jax.random.uniform(key, (BS, 32, 32, 3)))}

    my_batches = [batch(i) for i in range(NB) if i % nproc == pid]
    merged = {k: float(v) for k, v in
              _eval_reconstruction(model, state, iter(my_batches), config).items()}

    # single-host truth: the same evaluator flags over ALL batches, no merge
    evaluator = TokenizerEvaluator(
        enable_psnr_score=True, enable_ssim_score=True,
        enable_mse_error=True, enable_mae_error=True,
        enable_codebook_usage_measure=True, enable_codebook_entropy_measure=True,
        num_codebook_entries=16,
    )
    apply_fn = jax.jit(lambda v, x: model.apply(v, x))
    for i in range(NB):
        images = jnp.asarray(batch(i)["image"])
        recons, result = apply_fn(variables, images)
        evaluator.update(images, jnp.clip(recons, 0.0, 1.0),
                         codebook_indices=result["min_encoding_indices"])
    expected = {k: float(v) for k, v in evaluator.result().items()}

    # a per-host fact that genuinely disagrees must raise loudly on EVERY
    # host (all hosts run the same fixed-shape allgather, then all raise)
    # instead of deadlocking a gated collective
    from maskbit_tpu.parallel.mesh import assert_host_agreement

    try:
        assert_host_agreement({"weights found": pid == 0}, context="worker test")
        disagreement_raised = False
    except RuntimeError as e:
        disagreement_raised = "disagree" in str(e) and "weights found" in str(e)

    with open(os.path.join(workspace, f"tok_eval_result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "local_batches": len(my_batches),
                   "results": merged, "expected": expected,
                   "disagreement_raised": disagreement_raised}, f)
    print(f"tok eval worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
