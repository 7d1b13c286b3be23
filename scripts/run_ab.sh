#!/usr/bin/env bash
# Cached-vs-baseline launch MATRIX — the reference's paired A/B workflow
# (/root/reference/scripts/run.sh:1-14: each cached launcher followed by its
# torchrec_* baseline twin, sweeping an env-var grid of
# EMB_DIM x PREFETCH_NUM x GPUNUM x KERNELTYPE x BATCHSIZE x SHARDTYPE,
# /root/reference/scripts/torchrec_kaggle.sh:24-50) as one grid driver.
#
# Every grid point launches BOTH sides back to back on the same stream/seed:
#   A. the cached CLI  (cachedembedding_tpu.train.dlrm_main), and
#   B. the baseline CLI (cachedembedding_tpu.baselines.dlrm_main, fully
#      HBM-resident planner — the torchrec-"fused" analog; no UVM on TPU),
# then points at scripts/run_ab.py for the strict same-stream AUROC gate.
# Per-config logs land under $LOG_DIR.
#
# Grid knobs (space-separated lists; defaults = quick synthetic sweep):
#   EMB_DIMS="128"          embedding dims
#   PREFETCHES="1 8"        prefetch window depths
#   BATCHES="16384"         batch sizes
#   SHARDS="single"         single | table | row      (cached-side topology)
#   NEMB=""                 per-feature table sizes, e.g. "200000,100000,..."
#   TRAIN_BATCHES=64        train iters per run
#   DATASET_DIR=""          real data (else synthetic)
#   LOG_DIR=./logs/ab       per-config logs
set -uo pipefail
cd "$(dirname "$0")/.."

EMB_DIMS=${EMB_DIMS:-"128"}
PREFETCHES=${PREFETCHES:-"1 8"}
BATCHES=${BATCHES:-"16384"}
SHARDS=${SHARDS:-"single"}
NEMB=${NEMB:-"1000000,500000,200000,100000"}
TRAIN_BATCHES=${TRAIN_BATCHES:-64}
LOG_DIR=${LOG_DIR:-./logs/ab}
CACHE_RATIO=${CACHE_RATIO:-0.01}
EXTRA=${EXTRA:-}

mkdir -p "$LOG_DIR"
fail=0
for D in $EMB_DIMS; do
for P in $PREFETCHES; do
for B in $BATCHES; do
for S in $SHARDS; do
  tag="d${D}_p${P}_b${B}_${S}"
  common=(--embedding_dim "$D" --batch_size "$B"
          --limit_train_batches "$TRAIN_BATCHES" --limit_val_batches 8
          --num_embeddings_per_feature "$NEMB")
  [ -n "${DATASET_DIR:-}" ] && common+=(--dataset_dir "$DATASET_DIR")

  a=(--use_cache --use_freq --cache_ratio "$CACHE_RATIO"
     --prefetch_num "$P" --use_overlap)
  case "$S" in
    single) ;;
    table)  a+=(--use_tablewise) ;;
    row)    a+=(--use_rowwise) ;;
    *) echo "unknown shard type: $S" >&2; exit 2 ;;
  esac

  echo "=== A(cached) $tag ==="
  # shellcheck disable=SC2086
  if python -m cachedembedding_tpu.train.dlrm_main \
      "${common[@]}" "${a[@]}" $EXTRA > "$LOG_DIR/${tag}_cached.log" 2>&1
  then tail -n 2 "$LOG_DIR/${tag}_cached.log"
  else echo "FAILED (see $LOG_DIR/${tag}_cached.log)"; fail=1; fi

  echo "=== B(baseline hbm) $tag ==="
  # shellcheck disable=SC2086
  if python -m cachedembedding_tpu.baselines.dlrm_main \
      "${common[@]}" --kernel hbm --prefetch_num "$P" $EXTRA \
      > "$LOG_DIR/${tag}_baseline.log" 2>&1
  then tail -n 2 "$LOG_DIR/${tag}_baseline.log"
  else echo "FAILED (see $LOG_DIR/${tag}_baseline.log)"; fail=1; fi
done
done
done
done
exit $fail
