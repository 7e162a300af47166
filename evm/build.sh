#!/usr/bin/env bash
# Reproducible build + test + difftest recipe for the EVM layer.
#
# This build image ships NO solc/forge/anvil (zero egress), so in-image
# correctness is pinned by tests/test_evm_difftest.py: evm/difftest.py runs
# against evm/mocknode.py, a statement-for-statement twin of
# DVDXRewards.sol behind an anvil-style JSON-RPC surface, and the four
# scenarios of evm/test/DVDXRewards.t.sol are replayed against it.
#
# Run THIS script wherever foundry exists to execute the identical sequence
# at bytecode level. Pinned toolchain: solc 0.8.24 via foundry (any 0.8.20+
# works; the contract uses no post-0.8.20 features).
set -euo pipefail
cd "$(dirname "$0")/.."

FOUNDRY_PROFILE=default
export FOUNDRY_SOLC_VERSION=0.8.24

echo "== 1. compile + forge unit tests (evm/test/DVDXRewards.t.sol) =="
forge build --root evm --contracts evm
forge test  --root evm --match-contract DVDXRewardsTest -vv

echo "== 2. local chain + differential test vs network/ledger.py =="
anvil --port 8545 --silent &
ANVIL_PID=$!
trap 'kill $ANVIL_PID' EXIT
sleep 1

# anvil dev accounts 0..3 (unlocked)
DEPLOYER=0xf39Fd6e51aad88F6F4ce6aB8827279cffFb92266
VALIDATOR=0x70997970C51812dc3A010C7d01b50e0d17dc79C8
MINER=0x3C44CdDdB6a900fa2b585dd299e03d12FA4293BC
USER=0x90F79bf6EB2c4f870365E785982E1f101E93b906
PK=0xac0974bec39a7c7bb48b75ad6b9cbc32c0d15e89dd14bc0e2dde5fad8d3c33aa

TAO=$(forge create evm/MockTAO.sol:MockTAO --rpc-url http://127.0.0.1:8545 \
      --private-key $PK --json | python3 -c 'import json,sys; print(json.load(sys.stdin)["deployedTo"])')
REWARDS=$(forge create evm/DVDXRewards.sol:DVDXRewards \
      --rpc-url http://127.0.0.1:8545 --private-key $PK --json \
      --constructor-args "$TAO" "$VALIDATOR" | python3 -c 'import json,sys; print(json.load(sys.stdin)["deployedTo"])')

cast send "$TAO" "mint(address,uint256)" "$MINER" 1000 --private-key $PK --rpc-url http://127.0.0.1:8545
cast send "$TAO" "mint(address,uint256)" "$USER" 10000 --private-key $PK --rpc-url http://127.0.0.1:8545
for WHO in "$MINER" "$USER"; do
  cast send "$TAO" "approve(address,uint256)" "$REWARDS" \
    0xffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff \
    --unlocked --from "$WHO" --rpc-url http://127.0.0.1:8545
done

python3 evm/difftest.py --rpc http://127.0.0.1:8545 --contract "$REWARDS" \
    --validator "$VALIDATOR" --miner "$MINER" --user "$USER"
echo "== all green =="
