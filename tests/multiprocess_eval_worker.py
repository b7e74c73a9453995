"""Worker: run the REAL eval_maskbit CLI under 2-process jax.distributed.

Each process samples its strided share of the labels on a per-host mesh
(no cross-host arrays), then the ADM moments merge across processes —
the pod gFID evaluation path (reference scripts/eval_maskbit.py:34-56).
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    workspace = sys.argv[4]
    config_path = sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WORKSPACE"] = workspace
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    import maskbit_tpu.cli.eval_maskbit as em

    # deterministic stub inception (same as test_cli_eval_demo): drives the
    # full moment-accumulator + merge_across_hosts + FID/IS path
    proj = np.asarray(np.random.default_rng(0).normal(size=(3, 2048)), np.float32)

    def stub_inception_fn():
        def fn(images_255):
            pooled = jnp.mean(images_255 / 255.0, axis=(1, 2))
            feats = pooled @ jnp.asarray(proj)
            return {"2048": feats, "logits_unbiased": feats[:, :1008]}

        return fn

    em.make_inception_fn = stub_inception_fn
    results = em.main([f"config={config_path}"])
    with open(os.path.join(workspace, f"eval_result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "results": dict(results)}, f)
    print(f"eval worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
