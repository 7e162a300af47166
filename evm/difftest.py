"""Differential test: network/ledger.py vs DVDXRewards.sol on a live chain.

Replays the scripted event sequence pinned by
tests/test_chain.py::test_ledger_difftest_script_sequence against a real
node (anvil/hardhat dev chain with unlocked accounts) through ChainLedger,
and asserts both implementations reach the same end state (claims, stakes).

This image ships no EVM node or solc, so this script is the bridge for
environments that do:

    anvil &                                   # unlocked dev accounts
    forge create evm/MockTAO.sol:MockTAO ...  # or scripts/evm_deploy.sh
    forge create evm/DVDXRewards.sol:DVDXRewards \
        --constructor-args $TAO $VALIDATOR ...
    python evm/difftest.py --rpc http://127.0.0.1:8545 \
        --contract $REWARDS --validator $V --miner $M --user $U

Exit code 0 = chain semantics match the in-process ledger.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dvdx_tpu.network.chain import ChainLedger  # noqa: E402
from dvdx_tpu.network.ledger import Ledger, prompt_commitment  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rpc", default="http://127.0.0.1:8545")
    ap.add_argument("--contract", required=True)
    ap.add_argument("--validator", required=True)
    ap.add_argument("--miner", required=True)
    ap.add_argument("--user", required=True)
    args = ap.parse_args(argv)

    # reference run on the in-process ledger
    led = Ledger()
    led.mint("user", 10_000)
    led.mint("miner-0", 1_000)
    led.stake("miner-0", 1_000)
    led.deposit_and_commit("user", "r1", prompt_commitment("p"), 10_000)
    led.record_submission("validator", "r1", "miner-0", 0.8, b"\x00" * 32)
    led.distribute_rewards("validator", "r1")
    led.slash_stake("validator", "miner-0")
    led.set_weights("validator", [0, 3], [65535, 1200])
    led.set_weights("validator", [3], [65535])   # epoch 2 replaces epoch 1
    want_miner_claim = led.claim("miner-0")
    want_validator_claim = led.claim("validator")
    want_stake = led.stake_of("miner-0")
    want_epoch = led.weights_epoch
    want_w = (led.weight_of(0), led.weight_of(3))

    chain = ChainLedger(args.rpc, args.contract,
                        validator_address=args.validator,
                        accounts={"miner-0": args.miner, "user": args.user})
    # NOTE: ERC-20 approvals for stake/deposit must be done beforehand
    chain.stake("miner-0", 1_000)
    chain.deposit_and_commit("user", "r1", prompt_commitment("p"), 10_000)
    chain.record_submission("validator", "r1", "miner-0", 0.8, b"\x00" * 32)
    chain.distribute_rewards("validator", "r1")
    chain.slash_stake("validator", "miner-0")
    chain.set_weights("validator", [0, 3], [65535, 1200])
    chain.set_weights("validator", [3], [65535])

    got_miner_claim = chain.claimable_of("miner-0")
    got_validator_claim = chain.claimable_of("validator")
    got_stake = chain.stake_of("miner-0")
    got_epoch = chain.weights_epoch()
    got_w = (chain.weight_of(0), chain.weight_of(3))

    ok = (got_miner_claim == want_miner_claim
          and got_validator_claim == want_validator_claim
          and got_stake == want_stake
          and chain.request_status("r1") == 3
          and got_epoch == want_epoch
          and got_w == want_w
          and chain.weight_uid_count() == 1)
    print({"miner_claim": (got_miner_claim, want_miner_claim),
           "validator_claim": (got_validator_claim, want_validator_claim),
           "miner_stake": (got_stake, want_stake),
           "status": chain.request_status("r1"),
           "weights_epoch": (got_epoch, want_epoch),
           "weights": (got_w, want_w), "match": ok})
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
