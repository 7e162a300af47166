// SPDX-License-Identifier: MIT
pragma solidity ^0.8.20;

/// @title DVDXRewards — escrow / commit-reveal / reward settlement for the
/// dvdx decentralised video-generation network.
///
/// On-chain counterpart of the in-process deterministic ledger
/// (dvdx_tpu/network/ledger.py); same capability surface as the reference
/// system's rewards contract (deposit+commit, validator-recorded submissions
/// gated on miner stake, pro-rata reward distribution, claims, slashing,
/// stuck-request refunds). Written fresh for this framework: prompt
/// commitments are sha256 (matching the off-chain python ledger and the
/// validator's prompt check), token amounts are an ERC-20 `tao`.
interface IERC20 {
    function transfer(address to, uint256 amount) external returns (bool);
    function transferFrom(address from, address to, uint256 amount)
        external returns (bool);
}

contract DVDXRewards {
    IERC20 public immutable tao;
    address public validator;

    uint16 public constant MINER_SPLIT_BPS = 7000;   // s = 0.70
    uint16 public constant SLASH_BPS = 1000;         // f* = 0.10
    uint64 public constant REFUND_DELAY = 10 minutes;
    uint64 public constant UNBOND_DELAY = 1 days;    // stake exit cooldown

    struct Request {
        address user;
        bytes32 promptHash;      // sha256(prompt)
        uint256 amount;          // escrowed
        uint64 createdAt;
        uint8 status;            // 0 none, 1 pending, 2 submitted, 3 distributed, 4 refunded
    }

    struct Submission {
        uint32 scoreMilli;       // MD-VQS score x 1000
        bytes32 merkleRoot;
        bool exists;
    }

    mapping(bytes32 => Request) public requests;
    mapping(bytes32 => address[]) public submitters;
    mapping(bytes32 => mapping(address => Submission)) public submissions;
    mapping(address => uint256) public stakes;
    mapping(address => uint256) public claimable;
    // stake exit: amount queued for withdrawal and when it unlocks; queued
    // stake remains slashable until withdrawn (cooldown = audit window)
    mapping(address => uint256) public unbonding;
    mapping(address => uint64) public unbondAt;
    // epoch-stamped miner weight vector (kappa-clipped, max-normalised u16 —
    // the validator's ScoreBook emission). weightUids is the current epoch's
    // uid set; weightOf is cleared and rewritten atomically each epoch so a
    // deregistered miner's stale weight can never linger.
    uint64 public weightsEpoch;
    uint16[] public weightUids;
    mapping(uint16 => uint16) public weightOf;

    event Deposit(bytes32 indexed requestId, address indexed user,
                  uint256 amount, bytes32 promptHash);
    event SubmissionRecorded(bytes32 indexed requestId, address indexed miner,
                             uint32 scoreMilli, bytes32 merkleRoot);
    event RewardsDistributed(bytes32 indexed requestId, uint256 minerPool,
                             uint256 validatorCut);
    event StakeSlashed(address indexed miner, uint256 amount);
    event UnstakeRequested(address indexed miner, uint256 amount, uint64 at);
    event StakeWithdrawn(address indexed miner, uint256 amount);
    event Refunded(bytes32 indexed requestId, uint256 amount);
    event WeightsSet(uint64 indexed epoch, uint16[] uids, uint16[] weights);

    modifier onlyValidator() {
        require(msg.sender == validator, "not validator");
        _;
    }

    constructor(IERC20 _tao, address _validator) {
        tao = _tao;
        validator = _validator;
    }

    /// Escrow user funds against a prompt commitment (commit-then-reveal:
    /// the cleartext prompt goes to the validator off-chain and is checked
    /// against this hash).
    function depositAndCommit(bytes32 requestId, bytes32 promptHash,
                              uint256 amount) external {
        require(requests[requestId].status == 0, "request exists");
        require(amount > 0, "zero deposit");
        require(tao.transferFrom(msg.sender, address(this), amount), "xfer");
        requests[requestId] = Request(msg.sender, promptHash, amount,
                                      uint64(block.timestamp), 1);
        emit Deposit(requestId, msg.sender, amount, promptHash);
    }

    function stake(uint256 amount) external {
        require(tao.transferFrom(msg.sender, address(this), amount), "xfer");
        stakes[msg.sender] += amount;
    }

    /// Begin a stake exit: moves `amount` into the unbonding queue; it stays
    /// slashable for UNBOND_DELAY so a cheat caught during the audit window
    /// cannot front-run its slash by withdrawing (ADVICE r1 — stake() had no
    /// exit at all).
    function requestUnstake(uint256 amount) external {
        require(stakes[msg.sender] >= amount, "insufficient stake");
        stakes[msg.sender] -= amount;
        unbonding[msg.sender] += amount;
        unbondAt[msg.sender] = uint64(block.timestamp) + UNBOND_DELAY;
        emit UnstakeRequested(msg.sender, amount, unbondAt[msg.sender]);
    }

    function withdrawStake() external {
        require(unbonding[msg.sender] > 0, "nothing unbonding");
        require(block.timestamp >= unbondAt[msg.sender], "unbonding");
        uint256 amt = unbonding[msg.sender];
        unbonding[msg.sender] = 0;
        require(tao.transfer(msg.sender, amt), "xfer");
        emit StakeWithdrawn(msg.sender, amt);
    }

    /// Validator records a verified miner submission. Proof bytes carry
    /// (merkleRoot) — the full Proof-of-Inference verification happened
    /// off-chain via bitwise re-execution; the root anchors it.
    function recordSubmission(bytes32 requestId, address miner,
                              uint32 scoreMilli, bytes32 merkleRoot)
        external onlyValidator {
        Request storage r = requests[requestId];
        require(r.status == 1 || r.status == 2, "bad status");
        require(stakes[miner] > 0, "miner not staked");
        if (!submissions[requestId][miner].exists) {
            submitters[requestId].push(miner);
        }
        submissions[requestId][miner] = Submission(scoreMilli, merkleRoot, true);
        r.status = 2;
        emit SubmissionRecorded(requestId, miner, scoreMilli, merkleRoot);
    }

    /// Split escrow: MINER_SPLIT pro-rata to score, remainder to validator.
    function distributeRewards(bytes32 requestId) external onlyValidator {
        Request storage r = requests[requestId];
        require(r.status == 2, "nothing to distribute");
        uint256 minerPool = (r.amount * MINER_SPLIT_BPS) / 10000;
        uint256 totalScore;
        address[] storage subs = submitters[requestId];
        for (uint256 i = 0; i < subs.length; i++) {
            totalScore += submissions[requestId][subs[i]].scoreMilli;
        }
        uint256 paid;
        if (totalScore > 0) {
            for (uint256 i = 0; i < subs.length; i++) {
                uint256 share = (minerPool *
                    submissions[requestId][subs[i]].scoreMilli) / totalScore;
                claimable[subs[i]] += share;
                paid += share;
            }
        }
        claimable[validator] += r.amount - paid;
        r.status = 3;
        emit RewardsDistributed(requestId, minerPool, r.amount - paid);
    }

    function claimReward() external {
        uint256 amt = claimable[msg.sender];
        claimable[msg.sender] = 0;
        require(tao.transfer(msg.sender, amt), "xfer");
    }

    function slashStake(address miner) external onlyValidator {
        // unbonding stake is still slashable (audit-window exit protection)
        uint256 base = stakes[miner] + unbonding[miner];
        uint256 cut = (base * SLASH_BPS) / 10000;
        uint256 fromUnbonding = cut > stakes[miner] ? cut - stakes[miner] : 0;
        stakes[miner] -= cut - fromUnbonding;   // burned in-contract
        unbonding[miner] -= fromUnbonding;
        emit StakeSlashed(miner, cut);
    }

    /// Validator records its per-epoch miner weight vector on-chain — the
    /// durable incentive artifact (chain analog of the off-chain ScoreBook's
    /// u16 emission; the reference writes the same vector to its subnet
    /// chain every epoch). Replaces the previous epoch's vector wholesale.
    function setWeights(uint16[] calldata uids, uint16[] calldata w)
        external onlyValidator {
        require(uids.length == w.length, "length mismatch");
        require(uids.length > 0, "empty weights");
        for (uint256 i = 0; i < weightUids.length; i++) {
            delete weightOf[weightUids[i]];
        }
        delete weightUids;
        for (uint256 i = 0; i < uids.length; i++) {
            require(i == 0 || uids[i] > uids[i - 1], "uids not sorted");
            weightOf[uids[i]] = w[i];
            weightUids.push(uids[i]);
        }
        weightsEpoch += 1;
        emit WeightsSet(weightsEpoch, uids, w);
    }

    function weightUidCount() external view returns (uint256) {
        return weightUids.length;
    }

    /// Refund a request stuck pending past the delay (the deposit listener's
    /// auto-refund path; callable by anyone after the delay).
    function refundUnused(bytes32 requestId) external {
        Request storage r = requests[requestId];
        require(r.status == 1, "not refundable");
        require(msg.sender == validator ||
                block.timestamp > r.createdAt + REFUND_DELAY, "too early");
        r.status = 4;
        require(tao.transfer(r.user, r.amount), "xfer");
        emit Refunded(requestId, r.amount);
    }
}
