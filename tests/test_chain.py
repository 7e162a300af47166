"""EVM bridge: keccak correctness, ABI encoding, and the ChainLedger adapter
driving a scripted JSON-RPC endpoint (VERDICT r1 item 5; anvil/forge are not
shipped in this image, so on-node execution is covered by evm/difftest.py
when a node is reachable — here the wire behaviour is pinned exactly)."""

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from dvdx_tpu.network.chain import (ChainLedger, encode_call,
                                    request_id_to_bytes32)
from dvdx_tpu.network.ledger import Ledger, LedgerError, prompt_commitment
from dvdx_tpu.utils.keccak import event_topic, keccak256, selector

VALIDATOR = "0x" + "11" * 20
MINER = "0x" + "22" * 20
USER = "0x" + "33" * 20


# --- keccak ------------------------------------------------------------------


def test_keccak256_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert keccak256(b"hello").hex() == (
        "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8")
    # multi-block (> 136-byte rate) and pad-edge (135 bytes -> 1-byte pad)
    assert keccak256(b"x" * 300) != keccak256(b"x" * 299)
    assert len(keccak256(b"y" * 135)) == 32
    assert keccak256(b"The quick brown fox jumps over the lazy dog").hex() == (
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")


def test_selectors_match_known_values():
    assert selector("transfer(address,uint256)").hex() == "a9059cbb"
    assert selector("balanceOf(address)").hex() == "70a08231"
    assert event_topic("Transfer(address,address,uint256)").hex() == (
        "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")


def test_abi_encoding():
    data = encode_call("stake(uint256)", [1000])
    assert data[:4] == selector("stake(uint256)")
    assert data[4:].hex() == "%064x" % 1000
    data = encode_call("slashStake(address)", [MINER])
    assert data[4:].hex() == "0" * 24 + "22" * 20
    with pytest.raises(ValueError):
        encode_call("stake(uint256)", [1, 2])
    with pytest.raises(ValueError):
        encode_call("f(bytes)", [b"dyn"])  # dynamic types unsupported


# --- scripted JSON-RPC endpoint -------------------------------------------------


class _RpcHandler(BaseHTTPRequestHandler):
    store = None  # set by fixture

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        method, params = body["method"], body["params"]
        if method == "eth_sendTransaction":
            self.store["txs"].append(params[0])
            result = "0x" + ("ab" * 32)
        elif method == "eth_getTransactionReceipt":
            result = {"status": "0x1"}
        elif method == "eth_call":
            data = params[0]["data"]
            result = self.store["calls"].get(data[:10], "0x" + "00" * 32)
        else:
            result = None
        reply = {"jsonrpc": "2.0", "id": body["id"], "result": result}
        out = json.dumps(reply).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture()
def rpc_server():
    store = {"txs": [], "calls": {}}
    _RpcHandler.store = store
    srv = HTTPServer(("127.0.0.1", 0), _RpcHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", store
    srv.shutdown()


def _ledger(url):
    return ChainLedger(url, contract="0x" + "aa" * 20,
                       validator_address=VALIDATOR,
                       accounts={"miner-0": MINER, "user": USER})


def test_chain_ledger_sends_exact_calldata(rpc_server):
    url, store = rpc_server
    led = _ledger(url)
    root = hashlib.sha256(b"trace").digest()
    led.record_submission("validator", "req-1", "miner-0", 0.875,
                          root + b"sig-tail")
    led.distribute_rewards("validator", "req-1")
    led.slash_stake("validator", "miner-0")

    assert [t["from"] for t in store["txs"]] == [VALIDATOR] * 3
    rid = request_id_to_bytes32("req-1")
    want0 = encode_call("recordSubmission(bytes32,address,uint32,bytes32)",
                        [rid, MINER, 875, root])
    assert store["txs"][0]["data"] == "0x" + want0.hex()
    want1 = encode_call("distributeRewards(bytes32)", [rid])
    assert store["txs"][1]["data"] == "0x" + want1.hex()
    want2 = encode_call("slashStake(address)", [MINER])
    assert store["txs"][2]["data"] == "0x" + want2.hex()


def test_chain_ledger_reads_and_errors(rpc_server):
    url, store = rpc_server
    led = _ledger(url)
    stake_sel = "0x" + encode_call("stakes(address)", [MINER])[:4].hex()
    store["calls"][stake_sel] = "0x" + "%064x" % 5000
    assert led.stake_of("miner-0") == 5000
    with pytest.raises(LedgerError):
        led.record_submission("validator", "r", "unknown-account", 1.0, b"")
    with pytest.raises(LedgerError):
        led.mint("miner-0", 10)


def test_chain_ledger_settles_validator_round(rpc_server, tiny_pipeline_module):
    """Full mock-network round with the CHAIN ledger: the validator's
    record/distribute/slash calls land as transactions (the reference's
    web3 path, validator.py:1141-1207)."""
    import asyncio

    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig

    url, store = rpc_server
    cfg = ValidatorConfig(sample_size=2, num_checkpoints=2, num_frames=2,
                          width=32, height=32, num_steps=3)
    net = build_mock_network(n_miners=2, adversaries=["lazy"],
                             pipeline=tiny_pipeline_module,
                             validator_config=cfg)
    chain = ChainLedger(url, contract="0x" + "aa" * 20,
                        validator_address=VALIDATOR,
                        accounts={"miner-0": MINER, "miner-1": "0x" + "44" * 20})
    # miners must show stake on the chain view for slashing/record paths;
    # scripted endpoint returns stake for any account by default
    net.validator.ledger = chain
    report = asyncio.new_event_loop().run_until_complete(
        net.validator.run_round("req-chain", "a glass of water"))
    datas = [t["data"][:10] for t in store["txs"]]
    slash_sel = "0x" + selector("slashStake(address)").hex()
    record_sel = "0x" + selector(
        "recordSubmission(bytes32,address,uint32,bytes32)").hex()
    dist_sel = "0x" + selector("distributeRewards(bytes32)").hex()
    assert slash_sel in datas          # lazy miner slashed on-chain
    assert record_sel in datas         # honest submission recorded
    assert dist_sel in datas           # rewards distributed
    honest = report["miners"]["1"]
    assert honest["score"] > 0 and not honest.get("cheat")


# --- in-process ledger <-> contract semantics (differential fixture) -----------


def test_ledger_difftest_script_sequence():
    """The scripted sequence evm/difftest.py replays on a real node, executed
    here on the in-process ledger — pins the expected end state both sides
    must reach (stake after slash, miner/validator splits)."""
    led = Ledger()
    led.mint("user", 10_000)
    led.mint("miner-0", 1_000)
    led.stake("miner-0", 1_000)
    led.deposit_and_commit("user", "r1", prompt_commitment("p"), 10_000)
    led.record_submission("validator", "r1", "miner-0", 0.8, b"\x00" * 32)
    led.distribute_rewards("validator", "r1")
    led.slash_stake("validator", "miner-0")
    assert led.claim("miner-0") == 7_000      # MINER_SPLIT_BPS=7000
    assert led.claim("validator") == 3_000
    assert led.stake_of("miner-0") == 900     # SLASH_BPS=1000


def test_abi_encoding_dynamic_uint16_arrays():
    """setWeights(uint16[],uint16[]) calldata: two head offset words, then
    length-prefixed one-word-per-element tails (solidity ABI spec)."""
    data = encode_call("setWeights(uint16[],uint16[])", [[0, 3], [65535, 1200]])
    assert data[:4] == selector("setWeights(uint16[],uint16[])")
    words = [data[4 + 32 * i: 4 + 32 * (i + 1)].hex() for i in range(8)]
    assert words[0] == "%064x" % 0x40          # offset of uids tail
    assert words[1] == "%064x" % 0xA0          # offset of weights tail
    assert words[2] == "%064x" % 2             # uids length
    assert words[3] == "%064x" % 0
    assert words[4] == "%064x" % 3
    assert words[5] == "%064x" % 2             # weights length
    assert words[6] == "%064x" % 65535
    assert words[7] == "%064x" % 1200
    assert len(data) == 4 + 8 * 32


def test_chain_ledger_set_weights_calldata(rpc_server):
    url, store = rpc_server
    led = _ledger(url)
    led.set_weights("validator", [1, 2], [100, 200])
    want = encode_call("setWeights(uint16[],uint16[])", [[1, 2], [100, 200]])
    assert store["txs"][-1]["data"] == "0x" + want.hex()
    assert store["txs"][-1]["from"] == VALIDATOR


def test_ledger_difftest_weights_sequence():
    """The weights half of the difftest script, pinned on the in-process
    ledger (mirrors DVDXRewards.t.sol::testSetWeightsEpochReplacement)."""
    led = Ledger()
    led.set_weights("validator", [0, 3], [65535, 1200])
    led.set_weights("validator", [3], [65535])
    assert led.weights_epoch == 2
    assert led.weight_of(0) == 0 and led.weight_of(3) == 65535
