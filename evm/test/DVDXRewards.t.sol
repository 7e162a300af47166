// SPDX-License-Identifier: MIT
pragma solidity ^0.8.20;

// Forge unit tests for DVDXRewards (run with `forge test` where foundry is
// installed; this build image ships no solc, so correctness in-image is
// pinned by the python differential sequence in tests/test_chain.py and
// evm/difftest.py on a live node).

import "../DVDXRewards.sol";
import "../MockTAO.sol";

interface Vm {
    function prank(address) external;
    function warp(uint256) external;
    function expectRevert(bytes calldata) external;
}

contract DVDXRewardsTest {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    MockTAO tao;
    DVDXRewards rewards;
    address validator = address(0x11);
    address miner = address(0x22);
    address user = address(0x33);

    function setUp() public {
        tao = new MockTAO();
        rewards = new DVDXRewards(IERC20(address(tao)), validator);
        tao.mint(miner, 1_000);
        tao.mint(user, 10_000);
        vm.prank(miner);
        tao.approve(address(rewards), type(uint256).max);
        vm.prank(user);
        tao.approve(address(rewards), type(uint256).max);
    }

    function _fund() internal {
        vm.prank(miner);
        rewards.stake(1_000);
        vm.prank(user);
        rewards.depositAndCommit(bytes32("r1"), sha256("p"), 10_000);
    }

    /// Mirrors tests/test_chain.py::test_ledger_difftest_script_sequence —
    /// the scripted sequence both implementations must agree on.
    function testDifferentialSequence() public {
        _fund();
        vm.prank(validator);
        rewards.recordSubmission(bytes32("r1"), miner, 800, bytes32(0));
        vm.prank(validator);
        rewards.distributeRewards(bytes32("r1"));
        vm.prank(validator);
        rewards.slashStake(miner);
        require(rewards.claimable(miner) == 7_000, "miner split");
        require(rewards.claimable(validator) == 3_000, "validator split");
        require(rewards.stakes(miner) == 900, "slash 10%");
    }

    function testUnstakeCooldownBlocksEarlyExit() public {
        _fund();
        vm.prank(miner);
        rewards.requestUnstake(1_000);
        vm.prank(miner);
        vm.expectRevert("unbonding");
        rewards.withdrawStake();
        // still slashable during the cooldown
        vm.prank(validator);
        rewards.slashStake(miner);
        require(rewards.unbonding(miner) == 900, "unbonding slashed");
        vm.warp(block.timestamp + rewards.UNBOND_DELAY());
        vm.prank(miner);
        rewards.withdrawStake();
        require(rewards.unbonding(miner) == 0, "withdrawn");
    }

    function testOnlyValidatorGates() public {
        _fund();
        vm.expectRevert("not validator");
        rewards.recordSubmission(bytes32("r1"), miner, 800, bytes32(0));
        vm.expectRevert("not validator");
        rewards.distributeRewards(bytes32("r1"));
    }

    function testSetWeightsEpochReplacement() public {
        uint16[] memory uids = new uint16[](2);
        uint16[] memory w = new uint16[](2);
        uids[0] = 0; uids[1] = 3;
        w[0] = 65535; w[1] = 1200;
        vm.prank(validator);
        rewards.setWeights(uids, w);
        require(rewards.weightsEpoch() == 1, "epoch 1");
        require(rewards.weightOf(0) == 65535 && rewards.weightOf(3) == 1200,
                "weights stored");
        // next epoch replaces wholesale: uid 0 must be cleared
        uint16[] memory uids2 = new uint16[](1);
        uint16[] memory w2 = new uint16[](1);
        uids2[0] = 3; w2[0] = 65535;
        vm.prank(validator);
        rewards.setWeights(uids2, w2);
        require(rewards.weightsEpoch() == 2, "epoch 2");
        require(rewards.weightOf(0) == 0, "stale weight cleared");
        require(rewards.weightUidCount() == 1, "uid set replaced");
    }

    function testSetWeightsGates() public {
        uint16[] memory uids = new uint16[](1);
        uint16[] memory w = new uint16[](2);
        uids[0] = 1; w[0] = 1; w[1] = 2;
        vm.expectRevert("not validator");
        rewards.setWeights(uids, w);
        vm.prank(validator);
        vm.expectRevert("length mismatch");
        rewards.setWeights(uids, w);
        uint16[] memory unsorted = new uint16[](2);
        uint16[] memory w2 = new uint16[](2);
        unsorted[0] = 5; unsorted[1] = 5;
        vm.prank(validator);
        vm.expectRevert("uids not sorted");
        rewards.setWeights(unsorted, w2);
    }

    function testRefundAfterDelay() public {
        _fund();
        vm.expectRevert("too early");
        rewards.refundUnused(bytes32("r1"));
        vm.warp(block.timestamp + rewards.REFUND_DELAY() + 1);
        rewards.refundUnused(bytes32("r1"));
        require(tao.balanceOf(user) == 10_000, "refunded");
    }
}
