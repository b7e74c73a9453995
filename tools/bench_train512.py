"""Secondary tracked benchmark: 512px Stage-II training throughput.

VERDICT r3 #7: the headline bench (bench.py) tracks serving; training-side
rounds (donation, in-kernel-dropout attention, 512px unlock) moved no
visible artifact. This script measures the flagship 512px Stage-II train
step (14-bit, 24L/1024E, batch 16, fused_attention_dropout — the
configs/generator/maskbit_generator_14bit_512.yaml recipe) on the real
chip, prints one JSON line in the bench.py shape, and writes
TRAIN_BENCH.json at the repo root so the number is committed per round.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train512.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

RES, BATCH = 512, 16
OUT_FILE = os.path.join(REPO, "TRAIN_BENCH.json")


def main() -> None:
    import jax

    from profile_dropout_attention import stage_two_step

    print(f"devices: {jax.devices()}", file=sys.stderr)
    # remat=False: the in-kernel-dropout attention makes no-remat fit at
    # 512/b16 — the round-3 record configuration (BENCHMARKS.md, 36.6 img/s)
    dt = stage_two_step(RES, BATCH, "fused", remat=False)
    img_s = BATCH / dt
    prev = None
    if os.path.exists(OUT_FILE):
        with open(OUT_FILE) as f:
            prev = json.load(f).get("value")
    record = {
        "metric": f"images/sec/chip (14-bit Stage-II TRAIN step, {RES}px, "
                  f"batch {BATCH}, in-kernel-dropout attention)",
        "value": round(img_s, 4),
        "unit": "images/sec/chip",
        "vs_previous": round(img_s / prev, 4) if prev else 1.0,
    }
    with open(OUT_FILE, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
