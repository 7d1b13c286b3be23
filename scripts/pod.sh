#!/usr/bin/env bash
# Multi-host (TPU pod slice) launch: run this same command on EVERY host of
# the slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`). JAX is
# single-controller-per-host; jax.distributed.initialize() discovers the
# slice topology from the TPU metadata, after which jax.devices() spans the
# pod and the mesh paths (parallel/) shard across hosts over ICI/DCN.
# The host-DRAM master table row-shards across hosts (parallel/row.py) —
# the >=2-host scaling shape of BASELINE.md.
set -euo pipefail
exec python -m cachedembedding_tpu.train.dlrm_main --multihost "$@"
