"""Worker: run the REAL eval_tokenizer CLI under 2-process jax.distributed.

Each host evaluates its tar-shard split of the eval set; the streaming
accumulators merge across hosts (bit-exact f64 transport) and every host
must report the same final metrics — which the spawning test also compares
against a single-process run over ALL shards.
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
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    from maskbit_tpu.cli.eval_tokenizer import main as eval_main

    results = eval_main([f"config={config_path}"])
    with open(os.path.join(workspace, f"evaltok_result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "results": dict(results)}, f)
    print(f"eval_tokenizer worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
