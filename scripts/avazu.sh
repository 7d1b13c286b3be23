#!/usr/bin/env bash
# Avazu training launch (parity with /root/reference/scripts/avazu.sh, with the
# config drift fixed: the reference still passes the removed --cache_sets flag).
set -euo pipefail
: "${DATASET_DIR:?set DATASET_DIR to the preprocessed avazu npy dir}"
BATCHSIZE=${BATCHSIZE:-16384}
CACHERATIO=${CACHERATIO:-0.01}
PREFETCH_NUM=${PREFETCH_NUM:-1}
LR=${LR:-1.0}

exec python -m cachedembedding_tpu.train.dlrm_main \
  --dataset_dir "$DATASET_DIR" \
  --batch_size "$BATCHSIZE" --learning_rate "$LR" \
  --use_cache --cache_ratio "$CACHERATIO" --use_freq --use_overlap \
  --prefetch_num "$PREFETCH_NUM" "$@"
