#!/usr/bin/env bash
# Synthetic long-tail training — runs with no data on disk (the analog of the
# reference's custom/synth data paths, /root/reference/baselines/data/custom.py).
set -euo pipefail
BATCHSIZE=${BATCHSIZE:-16384}
CACHERATIO=${CACHERATIO:-0.01}
PREFETCH_NUM=${PREFETCH_NUM:-4}

exec python -m cachedembedding_tpu.train.dlrm_main \
  --batch_size "$BATCHSIZE" \
  --use_cache --cache_ratio "$CACHERATIO" --use_freq --use_overlap \
  --prefetch_num "$PREFETCH_NUM" \
  --limit_train_batches "${LIMIT:-100}" "$@"
