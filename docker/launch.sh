#!/usr/bin/env bash
# Build + run (analog of /root/reference/docker/launch.sh). On a TPU-VM the
# container needs privileged access to the TPU devices.
set -euo pipefail
IMAGE=${IMAGE:-cachedembedding-tpu}
docker build -t "$IMAGE" -f "$(dirname "$0")/Dockerfile" "$(dirname "$0")/.."
exec docker run --rm -it --privileged --net=host \
    -v "${DATASET_DIR:-/data}":/data \
    "$IMAGE" "$@"
