#!/usr/bin/env bash
# Weights-arrival automation (VERDICT r2 item 7): executes the quantitative
# parity runbook (docs/parity_runbook.md steps 1-3) end to end. Each step is
# gated on its input files, so dropping the weights in and re-running
# produces the rFID/gFID numbers with zero manual work.
#
# Inputs (env vars; see docs/parity_runbook.md §0 for the file sources):
#   WEIGHTS_DIR   directory holding the zoo .bin files + stats npz (default /w)
#   BITS          tokenizer/generator bit width to evaluate     (default 14)
#   TOK_CKPT / GEN_CKPT / STATS_NPZ   explicit file overrides
#   EVAL_SHARDS   ImageNet val webdataset pattern (for rFID)
#   MASKBIT_INCEPTION_WEIGHTS / MASKBIT_VGG16_WEIGHTS   aux weights
#   OUT           output workspace (default workspace/parity)
#
#   --smoke       prove the plumbing with SYNTHETIC flagship bins
#                 (tools/make_flagship_bins.py) and a tiny sample count;
#                 set MASKBIT_PARITY_FORCE_CPU=1 to keep it off the TPU.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

BITS="${BITS:-14}"
WEIGHTS_DIR="${WEIGHTS_DIR:-/w}"
OUT="${OUT:-$REPO/workspace/parity}"
mkdir -p "$OUT"

run_cli() { python tools/_run_cli.py "$@"; }

if [ "${1:-}" = "--smoke" ]; then
    echo "=== SMOKE: synthetic flagship bins through the converter + eval path"
    ZOO="${ZOO:-$OUT/zoo}"
    if [ ! -f "$ZOO/maskbit_tokenizer_14bit.bin" ]; then
        python tools/make_flagship_bins.py "$ZOO"
    fi
    WORKSPACE="$OUT/smoke_ws" run_cli maskbit_tpu.cli.eval_maskbit \
        config=configs/generator/maskbit_generator_14bit.yaml \
        experiment.vqgan_checkpoint="$ZOO/maskbit_tokenizer_14bit.bin" \
        experiment.generator_checkpoint="$ZOO/maskbit_generator_14bit.bin" \
        model.mlm_model.num_steps="${SMOKE_STEPS:-4}" \
        eval.batch_size="${SMOKE_BATCH:-2}" \
        eval.total_samples="${SMOKE_SAMPLES:-3}"
    echo "PARITY SMOKE OK"
    exit 0
fi

RAN=0

# -- [1/3] validate the Inception port vs the torch twin ---------------------
if [ -f "${MASKBIT_INCEPTION_WEIGHTS:-/nonexistent}" ]; then
    echo "=== [1/3] validate_inception (writes deltas to BENCHMARKS.md)"
    python tools/validate_inception.py --write
    RAN=$((RAN + 1))
else
    echo "--- [1/3] SKIP: MASKBIT_INCEPTION_WEIGHTS not set/missing"
fi

# -- [2/3] rFID: tokenizer reconstruction over ImageNet val ------------------
TOK="${TOK_CKPT:-$WEIGHTS_DIR/maskbit_tokenizer_${BITS}bit.bin}"
if [ -f "$TOK" ] && [ -n "${EVAL_SHARDS:-}" ]; then
    echo "=== [2/3] rFID eval (${BITS}-bit; targets: README.md:144-157)"
    WORKSPACE="$OUT/rfid_ws" run_cli maskbit_tpu.cli.eval_tokenizer \
        config="configs/tokenizer/maskbit_tokenizer_${BITS}bit.yaml" \
        experiment.vqgan_checkpoint="$TOK" \
        dataset.params.eval_shards_path_or_url="$EVAL_SHARDS"
    RAN=$((RAN + 1))
else
    echo "--- [2/3] SKIP: need $TOK and EVAL_SHARDS"
fi

# -- [3/3] gFID: ADM 50k protocol --------------------------------------------
GEN="${GEN_CKPT:-$WEIGHTS_DIR/maskbit_generator_${BITS}bit.bin}"
STATS="${STATS_NPZ:-$WEIGHTS_DIR/train_imagenet256_stats.npz}"
if [ -f "$TOK" ] && [ -f "$GEN" ]; then
    echo "=== [3/3] gFID eval (${BITS}-bit; targets: README.md:69-78)"
    EXTRA=()
    [ -f "$STATS" ] && EXTRA+=("eval.stats_path=$STATS")
    WORKSPACE="$OUT/gfid_ws" run_cli maskbit_tpu.cli.eval_maskbit \
        config="configs/generator/maskbit_generator_${BITS}bit.yaml" \
        experiment.vqgan_checkpoint="$TOK" \
        experiment.generator_checkpoint="$GEN" \
        "${EXTRA[@]}"
    RAN=$((RAN + 1))
else
    echo "--- [3/3] SKIP: need $TOK and $GEN"
fi

echo "run_parity: $RAN/3 steps ran (results under $OUT/*/eval*/eval_results.json)"
if [ "$RAN" -eq 0 ]; then
    echo "nothing to do — see docs/parity_runbook.md §0 for the required files"
    exit 2
fi
