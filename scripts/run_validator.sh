#!/usr/bin/env bash
# Launch a validator node (REST API + registry + forward loop).
# The run_validator.sh analog of the reference's scripts/.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m dvdx_tpu.network.services validator \
    --api-port "${API_PORT:-8100}" \
    --model "${MODEL:-zeroscope-v2-576w}" \
    --sample-size "${SAMPLE_SIZE:-3}" \
    --num-checkpoints "${NUM_CHECKPOINTS:-3}" \
    --concurrency "${CONCURRENCY:-1}" \
    --results-dir "${RESULTS_DIR:-generated_videos}" \
    "$@"
