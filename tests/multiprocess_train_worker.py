"""Worker: run a REAL train CLI under N-process jax.distributed.

Spawned by tests/test_multiprocess.py. This is the closest local equivalent
of a pod launch: every process runs the same training script,
jax.distributed joins them, the global batch is assembled from per-host
slices (global_batch_array), grads reduce across processes via GSPMD,
checkpoint writes coordinate through Orbax, and the in-train eval merges
accumulators with merge_across_hosts — the contract `accelerate launch`
provides the reference (scripts/train_tokenizer.py:61-67).

argv: pid nproc port workspace config_path [cli] [devices_per_proc]
  cli: "tokenizer" (default) or "maskbit"
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
    cli = sys.argv[6] if len(sys.argv) > 6 else "tokenizer"
    devices_per_proc = sys.argv[7] if len(sys.argv) > 7 else "2"

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WORKSPACE"] = workspace
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import yaml

    with open(config_path) as f:
        exp_name = yaml.safe_load(f)["experiment"]["name"]

    if cli == "maskbit":
        from maskbit_tpu.cli.train_maskbit import main as train_main

        loss_key = "mlm_loss"
    else:
        from maskbit_tpu.cli.train_tokenizer import main as train_main

        loss_key = "total_loss"
    train_main([f"config={config_path}"])

    # every process reports what it observed; the test asserts on these
    out_dir = os.path.join(workspace, exp_name)
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    result = {
        "pid": pid,
        "metrics_exists": os.path.exists(metrics_path),
        "losses": [],
    }
    if result["metrics_exists"]:
        with open(metrics_path) as f:
            for line in f:
                m = json.loads(line)
                if loss_key in m:
                    result["losses"].append(m[loss_key])
    with open(os.path.join(workspace, f"train_result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"train worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
