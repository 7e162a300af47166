#!/usr/bin/env bash
# Launch a miner node serving the inference + reveal protocol.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m dvdx_tpu.network.services miner \
    --port "${PORT:-8201}" \
    --validator-api "${VALIDATOR_API:-127.0.0.1:8100}" \
    --model "${MODEL:-zeroscope-v2-576w}" \
    --stake "${STAKE:-10000}" \
    "$@"
