"""Preemption-safe training (VERDICT r2 item 5): SIGTERM the REAL train CLI
mid-run, assert it writes a final checkpoint and exits cleanly, then resume
and assert training continues from the EXACT step — no lost work beyond the
in-flight step (the reference's resume-latest contract at
scripts/train_tokenizer.py:298-331 loses up to save_every steps)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = {
    "experiment": {"name": "sigterm_tok", "max_train_examples": 64,
                   # save_every/eval_every far beyond max_steps: the ONLY
                   # checkpoint can come from the SIGTERM path
                   "save_every": 10_000, "eval_every": 10_000,
                   "generate_every": 10_000, "log_every": 1,
                   "logger": "jsonl", "resume": True},
    "model": {
        "vq_model": {
            "model_class": "vqgan+", "quantizer_type": "lookup-free",
            "codebook_size": 16, "token_size": 4, "commitment_cost": 0.25,
            "entropy_loss_weight": 0.01, "entropy_loss_temperature": 0.01,
            "entropy_gamma": 1.0, "num_channels": 3, "hidden_channels": 32,
            "channel_mult": [1, 2], "num_resolutions": 2, "num_res_blocks": 1,
            "sample_with_conv": True,
        },
        "discriminator": {"name": "VQGAN+Discriminator", "num_channels": 3,
                          "num_stages": 1, "hidden_channels": 32,
                          "blur_resample": True, "blur_kernel_size": 4},
    },
    "losses": {
        "quantizer_weight": 1.0, "perceptual_loss": "none",
        "perceptual_weight": 0.0, "reconstruction_loss": "l2",
        "reconstruction_weight": 1.0, "discriminator_start": 10_000,
        "discriminator_loss": "hinge", "discriminator_factor": 1.0,
        "discriminator_weight": 0.1, "discriminator_gradient_penalty": "none",
        "discriminator_penalty_cost": 10.0, "lecam_regularization_weight": 0.0,
    },
    "dataset": {
        "params": {"train_shards_path_or_url": "/nonexistent/{0000..0001}.tar",
                   "eval_shards_path_or_url": "/nonexistent/{0000..0001}.tar"},
        "preprocessing": {"resolution": 32, "use_aspect_ratio_aug": False,
                          "use_random_crop": False, "min_scale": 0.8,
                          "interpolation": "bilinear"},
    },
    "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
    "lr_scheduler": {"scheduler": "constant", "params": {}},
    "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                 "mixed_precision": "no", "use_ema": True, "seed": 0,
                 "max_train_steps": 10_000, "overfit_batch": True,
                 "overfit_batch_num": 1, "num_generated_images": 1,
                 "max_grad_norm": 1.0},
}


def _logged_steps(metrics_path):
    if not os.path.exists(metrics_path):
        return []
    steps = []
    with open(metrics_path) as f:
        for line in f:
            try:
                m = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn line mid-write
            if "total_loss" in m and "step" in m:
                steps.append(m["step"])
    return steps


def test_sigterm_saves_and_resumes_exact_step(tmp_path):
    cfg = json.loads(json.dumps(CFG))
    config_path = tmp_path / "cfg.yaml"
    config_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "ws" / "sigterm_tok"
    metrics_path = out_dir / "metrics.jsonl"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["WORKSPACE"] = str(tmp_path / "ws")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "sigterm_train_worker.py"),
         str(config_path)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until a few steps have trained (compile included), then kill
        deadline = time.time() + 420
        while time.time() < deadline:
            if len(_logged_steps(metrics_path)) >= 3:
                break
            if proc.poll() is not None:
                out = proc.communicate()[0]
                pytest.fail(f"train CLI exited early rc={proc.returncode}:\n{out[-4000:]}")
            time.sleep(0.5)
        else:
            pytest.fail("train CLI never reached 3 steps")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, f"SIGTERM exit was not clean:\n{out[-4000:]}"
    assert "preemption: stopping cleanly" in out
    assert "train worker exited cleanly" in out

    # the final checkpoint landed at the last trained step
    ckpt_dir = out_dir / "checkpoints"
    metas = [p for p in os.listdir(ckpt_dir) if p.startswith("metadata-")]
    assert metas, "no checkpoint written on SIGTERM"
    saved_step = max(int(p[len("metadata-"):-len(".json")]) for p in metas)
    trained_steps = _logged_steps(metrics_path)
    # the shutdown break runs before the logging block, so the final trained
    # step may be saved without a metrics line — never the reverse
    assert max(trained_steps) <= saved_step <= max(trained_steps) + 1, (
        saved_step, max(trained_steps)
    )
    assert saved_step >= 3

    # resume: continue to saved_step + 2, exactly from the saved step
    cfg["training"]["max_train_steps"] = saved_step + 2
    config2 = tmp_path / "cfg2.yaml"
    config2.write_text(yaml.safe_dump(cfg))
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "sigterm_train_worker.py"),
         str(config2)],
        env=env, cwd=REPO, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc2.returncode == 0, proc2.stdout[-4000:]
    assert f"resumed from step {saved_step}" in proc2.stdout
    steps_after = _logged_steps(metrics_path)
    # the resumed run trained exactly steps saved_step+1, saved_step+2
    assert steps_after[len(trained_steps):] == [saved_step + 1, saved_step + 2]
