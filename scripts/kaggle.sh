#!/usr/bin/env bash
# Criteo-Kaggle training launch — env-var matrix parity with
# /root/reference/scripts/kaggle.sh:8-16,64-83. No torchx: JAX is
# single-controller, one process drives all local TPU chips.
set -euo pipefail

: "${DATASET_DIR:?set DATASET_DIR to the preprocessed kaggle npy dir}"
BATCHSIZE=${BATCHSIZE:-16384}
CACHERATIO=${CACHERATIO:-0.01}
PREFETCH_NUM=${PREFETCH_NUM:-1}
USE_LFU=${USE_LFU:-0}            # 1 -> --use_lfu (else DATASET eviction)
USE_TABLE_SHARD=${USE_TABLE_SHARD:-0}
USE_ASYNC=${USE_ASYNC:-1}        # overlap host<->HBM staging with compute
LR=${LR:-1.0}
EPOCHS=${EPOCHS:-1}

FLAGS=(--dataset_dir "$DATASET_DIR" --kaggle
       --batch_size "$BATCHSIZE" --learning_rate "$LR" --epochs "$EPOCHS"
       --use_cache --cache_ratio "$CACHERATIO" --use_freq
       --warmup_ratio 0.7 --buffer_size 50000
       --prefetch_num "$PREFETCH_NUM")
[ "$USE_LFU" = 1 ] && FLAGS+=(--use_lfu)
[ "$USE_TABLE_SHARD" = 1 ] && FLAGS+=(--use_tablewise)
[ "$USE_ASYNC" = 1 ] && FLAGS+=(--use_overlap)

exec python -m cachedembedding_tpu.train.dlrm_main "${FLAGS[@]}" "$@"
