"""Anvil-compatible mock EVM node executing a line-faithful twin of
DVDXRewards.sol — the in-image differential-execution target (VERDICT r2
item 6: no solc/anvil ships in this runtime, so the contract logic is
transliterated statement-for-statement below and executed behind the same
JSON-RPC surface a dev chain exposes).

What this proves in-image:
* ChainLedger's full client stack (ABI encoding, selectors, tx lifecycle,
  receipts, eth_call struct decoding) against an INDEPENDENT server-side
  decoder;
* the Solidity's storage/arithmetic/require logic (as transliterated, with
  Solidity 0.8 checked uint256 math) reaches the same end state as the
  in-process network/ledger.py — a genuine two-implementation difftest
  (tests/test_evm_difftest.py runs evm/difftest.py against this node).

What still needs a real toolchain: bytecode-level compilation. evm/build.sh
pins the foundry recipe; run it where forge exists and the same difftest
passes unchanged against real anvil (the script takes any --rpc).

RPC subset (what ChainLedger + anvil scripts use): eth_sendTransaction,
eth_getTransactionReceipt, eth_call, eth_blockNumber, evm_increaseTime,
plus the dev faucet dvdx_mintTAO.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Dict, List, Optional, Tuple

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dvdx_tpu.utils.keccak import keccak256, selector  # noqa: E402

U256 = (1 << 256) - 1
U64 = (1 << 64) - 1


class Revert(Exception):
    pass


def _require(cond: bool, msg: str):
    if not cond:
        raise Revert(msg)


def _u256(v: int) -> int:
    """Solidity 0.8 checked math: overflow/underflow reverts."""
    _require(0 <= v <= U256, "arithmetic over/underflow")
    return v


class MockTAO:
    """ERC-20 twin (MockTAO.sol): balances + transfer/transferFrom.
    Allowances are modeled as unlimited for unlocked dev accounts — the
    anvil deploy script pre-approves, and difftest documents the same."""

    def __init__(self):
        self.balances: Dict[str, int] = {}

    def mint(self, addr: str, amount: int):
        self.balances[addr] = _u256(self.balances.get(addr, 0) + amount)

    def transfer_from(self, frm: str, to: str, amount: int) -> bool:
        bal = self.balances.get(frm, 0)
        _require(bal >= amount, "ERC20: insufficient balance")
        self.balances[frm] = bal - amount
        self.balances[to] = _u256(self.balances.get(to, 0) + amount)
        return True

    transfer = transfer_from  # same semantics with frm = contract


class DVDXRewardsTwin:
    """Statement-for-statement transliteration of evm/DVDXRewards.sol.
    Comments cite the .sol line each block mirrors."""

    MINER_SPLIT_BPS = 7000           # DVDXRewards.sol:24
    SLASH_BPS = 1000                 # :25
    REFUND_DELAY = 10 * 60           # :26
    UNBOND_DELAY = 24 * 3600         # :27

    def __init__(self, tao: MockTAO, validator: str, address: str):
        self.tao = tao
        self.validator = validator.lower()
        self.address = address.lower()
        # storage (:43-51)
        self.requests: Dict[bytes, dict] = {}
        self.submitters: Dict[bytes, List[str]] = {}
        self.submissions: Dict[Tuple[bytes, str], dict] = {}
        self.stakes: Dict[str, int] = {}
        self.claimable: Dict[str, int] = {}
        self.unbonding: Dict[str, int] = {}
        self.unbond_at: Dict[str, int] = {}
        self.weights_epoch = 0               # :52-58
        self.weight_uids: List[int] = []
        self.weight_of: Dict[int, int] = {}
        self.events: List[dict] = []

    def _only_validator(self, sender: str):
        _require(sender == self.validator, "not validator")   # :64-67

    # :77-85
    def deposit_and_commit(self, sender: str, request_id: bytes,
                           prompt_hash: bytes, amount: int, now: int):
        r = self.requests.get(request_id)
        _require(r is None or r["status"] == 0, "request exists")
        _require(amount > 0, "zero deposit")
        _require(self.tao.transfer_from(sender, self.address, amount), "xfer")
        self.requests[request_id] = {
            "user": sender, "promptHash": prompt_hash, "amount": amount,
            "createdAt": now & U64, "status": 1}
        self.events.append({"name": "Deposit", "requestId": request_id,
                            "user": sender, "amount": amount,
                            "promptHash": prompt_hash})

    # :87-90
    def stake(self, sender: str, amount: int):
        _require(self.tao.transfer_from(sender, self.address, amount), "xfer")
        self.stakes[sender] = _u256(self.stakes.get(sender, 0) + amount)

    # :96-102
    def request_unstake(self, sender: str, amount: int, now: int):
        _require(self.stakes.get(sender, 0) >= amount, "insufficient stake")
        self.stakes[sender] -= amount
        self.unbonding[sender] = _u256(self.unbonding.get(sender, 0) + amount)
        self.unbond_at[sender] = (now + self.UNBOND_DELAY) & U64
        self.events.append({"name": "UnstakeRequested", "miner": sender,
                            "amount": amount, "at": self.unbond_at[sender]})

    # :104-111
    def withdraw_stake(self, sender: str, now: int):
        _require(self.unbonding.get(sender, 0) > 0, "nothing unbonding")
        _require(now >= self.unbond_at.get(sender, 0), "unbonding")
        amt = self.unbonding[sender]
        self.unbonding[sender] = 0
        _require(self.tao.transfer(self.address, sender, amt), "xfer")
        self.events.append({"name": "StakeWithdrawn", "miner": sender,
                            "amount": amt})

    # :116-128
    def record_submission(self, sender: str, request_id: bytes, miner: str,
                          score_milli: int, merkle_root: bytes):
        self._only_validator(sender)
        r = self.requests.get(request_id)
        _require(r is not None and r["status"] in (1, 2), "bad status")
        _require(self.stakes.get(miner, 0) > 0, "miner not staked")
        if not self.submissions.get((request_id, miner), {}).get("exists"):
            self.submitters.setdefault(request_id, []).append(miner)
        self.submissions[(request_id, miner)] = {
            "scoreMilli": score_milli & 0xFFFFFFFF,
            "merkleRoot": merkle_root, "exists": True}
        r["status"] = 2
        self.events.append({"name": "SubmissionRecorded",
                            "requestId": request_id, "miner": miner,
                            "scoreMilli": score_milli})

    # :131-152
    def distribute_rewards(self, sender: str, request_id: bytes):
        self._only_validator(sender)
        r = self.requests.get(request_id)
        _require(r is not None and r["status"] == 2, "nothing to distribute")
        miner_pool = (r["amount"] * self.MINER_SPLIT_BPS) // 10000
        subs = self.submitters.get(request_id, [])
        total_score = sum(self.submissions[(request_id, s)]["scoreMilli"]
                          for s in subs)
        paid = 0
        if total_score > 0:
            for s in subs:
                share = (miner_pool *
                         self.submissions[(request_id, s)]["scoreMilli"]
                         ) // total_score
                self.claimable[s] = _u256(self.claimable.get(s, 0) + share)
                paid += share
        self.claimable[self.validator] = _u256(
            self.claimable.get(self.validator, 0) + r["amount"] - paid)
        r["status"] = 3
        self.events.append({"name": "RewardsDistributed",
                            "requestId": request_id, "minerPool": miner_pool,
                            "validatorCut": r["amount"] - paid})

    # :154-158
    def claim_reward(self, sender: str):
        amt = self.claimable.get(sender, 0)
        self.claimable[sender] = 0
        _require(self.tao.transfer(self.address, sender, amt), "xfer")

    # :160-168
    def slash_stake(self, sender: str, miner: str):
        self._only_validator(sender)
        base = self.stakes.get(miner, 0) + self.unbonding.get(miner, 0)
        cut = (base * self.SLASH_BPS) // 10000
        stake_now = self.stakes.get(miner, 0)
        from_unbonding = cut - stake_now if cut > stake_now else 0
        self.stakes[miner] = _u256(stake_now - (cut - from_unbonding))
        self.unbonding[miner] = _u256(
            self.unbonding.get(miner, 0) - from_unbonding)
        self.events.append({"name": "StakeSlashed", "miner": miner,
                            "amount": cut})

    # setWeights (:~176-196): validator-only epoch-stamped weight vector,
    # wholesale replacement with sorted-uid + length requires
    def set_weights(self, sender: str, uids: List[int], w: List[int]):
        self._only_validator(sender)
        _require(len(uids) == len(w), "length mismatch")
        _require(len(uids) > 0, "empty weights")
        for old in self.weight_uids:
            self.weight_of.pop(old, None)
        self.weight_uids = []
        for i, u in enumerate(uids):
            _require(i == 0 or u > uids[i - 1], "uids not sorted")
            self.weight_of[u & 0xFFFF] = w[i] & 0xFFFF
            self.weight_uids.append(u & 0xFFFF)
        self.weights_epoch = (self.weights_epoch + 1) & U64
        self.events.append({"name": "WeightsSet", "epoch": self.weights_epoch,
                            "uids": list(uids), "weights": list(w)})

    # :172-180
    def refund_unused(self, sender: str, request_id: bytes, now: int):
        r = self.requests.get(request_id)
        _require(r is not None and r["status"] == 1, "not refundable")
        _require(sender == self.validator or
                 now > r["createdAt"] + self.REFUND_DELAY, "too early")
        r["status"] = 4
        _require(self.tao.transfer(self.address, r["user"], r["amount"]),
                 "xfer")
        self.events.append({"name": "Refunded", "requestId": request_id,
                            "amount": r["amount"]})


# --- JSON-RPC node -----------------------------------------------------------

_SEL = {
    "depositAndCommit(bytes32,bytes32,uint256)": "deposit",
    "stake(uint256)": "stake",
    "requestUnstake(uint256)": "request_unstake",
    "withdrawStake()": "withdraw_stake",
    "recordSubmission(bytes32,address,uint32,bytes32)": "record",
    "distributeRewards(bytes32)": "distribute",
    "claimReward()": "claim",
    "slashStake(address)": "slash",
    "refundUnused(bytes32)": "refund",
    "setWeights(uint16[],uint16[])": "set_weights",
    # views
    "stakes(address)": "v_stakes",
    "claimable(address)": "v_claimable",
    "unbonding(address)": "v_unbonding",
    "requests(bytes32)": "v_requests",
    "weightsEpoch()": "v_weights_epoch",
    "weightOf(uint16)": "v_weight_of",
    "weightUidCount()": "v_weight_uid_count",
}
_SELECTORS = {selector(sig): name for sig, name in _SEL.items()}


def _word(data: bytes, i: int) -> bytes:
    return data[4 + 32 * i: 4 + 32 * (i + 1)]


def _addr_of(word: bytes) -> str:
    return "0x" + word[12:].hex()


def _uint_array(data: bytes, head_index: int) -> List[int]:
    """Decode a dynamic uintN[] argument: the head word holds the byte offset
    (from the start of the args region) of the (length ‖ elements) tail."""
    off = int.from_bytes(_word(data, head_index), "big")
    base = 4 + off
    n = int.from_bytes(data[base: base + 32], "big")
    return [int.from_bytes(data[base + 32 * (1 + i): base + 32 * (2 + i)],
                           "big") for i in range(n)]


class MockNode:
    """In-process node state + calldata dispatcher."""

    def __init__(self, contract_addr: str, validator_addr: str):
        self.tao = MockTAO()
        self.contract = DVDXRewardsTwin(self.tao, validator_addr,
                                        contract_addr)
        self.timestamp = 1_700_000_000
        self.block = 1
        self.receipts: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def mint(self, addr: str, amount: int):
        self.tao.mint(addr.lower(), amount)

    # -- dispatch -------------------------------------------------------------

    def _exec(self, sender: str, data: bytes):
        name = _SELECTORS.get(data[:4])
        _require(name is not None, "unknown selector")
        c, now = self.contract, self.timestamp
        if name == "deposit":
            c.deposit_and_commit(sender, _word(data, 0), _word(data, 1),
                                 int.from_bytes(_word(data, 2), "big"), now)
        elif name == "stake":
            c.stake(sender, int.from_bytes(_word(data, 0), "big"))
        elif name == "request_unstake":
            c.request_unstake(sender, int.from_bytes(_word(data, 0), "big"),
                              now)
        elif name == "withdraw_stake":
            c.withdraw_stake(sender, now)
        elif name == "record":
            c.record_submission(sender, _word(data, 0),
                                _addr_of(_word(data, 1)),
                                int.from_bytes(_word(data, 2), "big"),
                                _word(data, 3))
        elif name == "distribute":
            c.distribute_rewards(sender, _word(data, 0))
        elif name == "claim":
            c.claim_reward(sender)
        elif name == "slash":
            c.slash_stake(sender, _addr_of(_word(data, 0)))
        elif name == "refund":
            c.refund_unused(sender, _word(data, 0), now)
        elif name == "set_weights":
            c.set_weights(sender, _uint_array(data, 0), _uint_array(data, 1))
        else:
            raise Revert(f"not a transaction entrypoint: {name}")

    def _view(self, data: bytes) -> bytes:
        name = _SELECTORS.get(data[:4])
        _require(name is not None, "unknown selector")
        c = self.contract
        if name == "v_stakes":
            return c.stakes.get(_addr_of(_word(data, 0)), 0).to_bytes(32, "big")
        if name == "v_claimable":
            return c.claimable.get(_addr_of(_word(data, 0)), 0).to_bytes(32, "big")
        if name == "v_unbonding":
            return c.unbonding.get(_addr_of(_word(data, 0)), 0).to_bytes(32, "big")
        if name == "v_weights_epoch":
            return c.weights_epoch.to_bytes(32, "big")
        if name == "v_weight_of":
            uid = int.from_bytes(_word(data, 0), "big")
            return c.weight_of.get(uid, 0).to_bytes(32, "big")
        if name == "v_weight_uid_count":
            return len(c.weight_uids).to_bytes(32, "big")
        if name == "v_requests":
            r = c.requests.get(_word(data, 0))
            if r is None:
                return b"\x00" * 160
            return (bytes(12) + bytes.fromhex(r["user"][2:])
                    + r["promptHash"]
                    + r["amount"].to_bytes(32, "big")
                    + r["createdAt"].to_bytes(32, "big")
                    + r["status"].to_bytes(32, "big"))
        raise Revert(f"not a view: {name}")

    # -- rpc ------------------------------------------------------------------

    def rpc(self, method: str, params: list):
        with self._lock:
            if method == "eth_sendTransaction":
                tx = params[0]
                sender = tx["from"].lower()
                data = bytes.fromhex(tx["data"].removeprefix("0x"))
                self.block += 1
                self.timestamp += 1
                txh = "0x" + keccak256(json.dumps(
                    [self.block, tx], sort_keys=True).encode()).hex()
                try:
                    self._exec(sender, data)
                    self.receipts[txh] = {"status": "0x1",
                                          "blockNumber": hex(self.block)}
                except Revert as e:
                    self.receipts[txh] = {"status": "0x0", "revert": str(e),
                                          "blockNumber": hex(self.block)}
                return txh
            if method == "eth_getTransactionReceipt":
                return self.receipts.get(params[0])
            if method == "eth_call":
                data = bytes.fromhex(params[0]["data"].removeprefix("0x"))
                return "0x" + self._view(data).hex()
            if method == "eth_blockNumber":
                return hex(self.block)
            if method == "evm_increaseTime":          # anvil dev method
                self.timestamp += int(params[0])
                return hex(self.timestamp)
            if method == "dvdx_mintTAO":              # dev faucet
                self.mint(params[0], int(params[1]))
                return True
            raise Revert(f"unsupported method {method}")


def serve(node: MockNode, port: int = 0) -> Tuple[HTTPServer, int]:
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            try:
                result = node.rpc(body["method"], body.get("params", []))
                reply = {"jsonrpc": "2.0", "id": body.get("id"),
                         "result": result}
            except Revert as e:
                reply = {"jsonrpc": "2.0", "id": body.get("id"),
                         "error": {"code": -32000, "message": str(e)}}
            data = json.dumps(reply).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="dvdx mock EVM node")
    ap.add_argument("--port", type=int, default=8545)
    ap.add_argument("--contract", default="0x" + "c0" * 20)
    ap.add_argument("--validator", default="0x" + "0a" * 20)
    ap.add_argument("--fund", nargs="*", default=[],
                    help="addresses to faucet 10^9 TAO each")
    args = ap.parse_args(argv)
    node = MockNode(args.contract, args.validator)
    for a in args.fund:
        node.mint(a, 10**9)
    srv, port = serve(node, args.port)
    print(json.dumps({"rpc": f"http://127.0.0.1:{port}",
                      "contract": args.contract,
                      "validator": args.validator}))
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
