"""HTTP transport, REST API, and deposit listener integration tests
(real sockets on localhost, real wire format)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp import ClientSession

from dvdx_tpu.network import protocol as P
from dvdx_tpu.network.api import create_app, serve_api
from dvdx_tpu.network.base import Registry
from dvdx_tpu.network.deposit_listener import DepositListener
from dvdx_tpu.network.http_transport import HttpTransport, serve_neuron
from dvdx_tpu.network.ledger import Ledger, prompt_commitment
from dvdx_tpu.network.miner import Miner
from dvdx_tpu.verify.proof import Keypair


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_deposit_listener_flow():
    led = Ledger()
    listener = DepositListener(led, stuck_timeout_s=9999)
    led.mint("alice", 500)
    led.deposit_and_commit("alice", "r1", prompt_commitment("hello"), 500)
    listener.poll_once()
    assert listener.status_of("r1")["status"] == "pending"
    assert not listener.attach_prompt("r1", "wrong prompt")
    assert listener.attach_prompt("r1", "hello")
    assert listener.next_ready() == "r1"
    listener.set_status("r1", "completed")
    assert listener.next_ready() is None


def test_deposit_listener_auto_refund():
    led = Ledger()
    listener = DepositListener(led, stuck_timeout_s=0.0)  # instant timeout
    led.mint("bob", 100)
    led.deposit_and_commit("bob", "r2", b"\x01" * 32, 100)
    listener.poll_once()   # registers
    listener.poll_once()   # refunds (age > 0)
    assert listener.status_of("r2")["status"] == "refunded"
    assert led.balance("bob") == 100
    assert listener.metrics["auto_refunds"] == 1


def test_http_transport_roundtrip(tiny_pipeline_module):
    async def go():
        reg = Registry()
        kp = Keypair.from_seed(b"http-miner")
        miner = Miner(tiny_pipeline_module, kp, reg)
        vkp = Keypair.from_seed(b"http-validator")
        reg.register(vkp.public_bytes, "v", role="validator", stake=100)
        runner, port = await serve_neuron(miner.handle, port=0)
        t = HttpTransport()
        try:
            pong = await t.request(f"127.0.0.1:{port}", P.Ping(nonce=5))
            assert isinstance(pong, P.Pong) and pong.nonce == 5
            import time as _time

            req = P.InferenceRequest(
                request_id="h1", prompt="an http request", width=32, height=32,
                num_frames=2, num_steps=2, seed=9, challenge=b"\x02" * 32,
                issued_at=_time.time(), validator_pubkey=vkp.public_bytes)
            req.signature = vkp.sign(P.signing_bytes(req))
            resp = await t.request(f"127.0.0.1:{port}", req)
            assert resp.status == "ok"
            assert len(resp.video) > 0
            assert len(resp.merkle_root) == 32
            # malformed body -> 400, transport raises
            async with ClientSession() as sess:
                async with sess.post(f"http://127.0.0.1:{port}/dvdx",
                                     data=b"junk") as r:
                    assert r.status == 400
        finally:
            await t.close()
            await runner.cleanup()

    _run(go())


def test_rest_api_lifecycle(tmp_path):
    async def go():
        led = Ledger()
        listener = DepositListener(led, stuck_timeout_s=9999)
        reg = Registry()
        # a finished round on disk: /requests must join it into the feed
        (tmp_path / "results_old-9.json").write_text(json.dumps({
            "miners": {"0": {"score": 0.42}, "1": {"score": 0.0, "cheat": True}}}))
        app = create_app(led, listener, reg, submit_wait_s=2.0,
                         results_dir=str(tmp_path))
        runner, port = await serve_api(app, port=0)
        base = f"http://127.0.0.1:{port}"
        try:
            async with ClientSession() as sess:
                async with sess.get(f"{base}/health") as r:
                    assert (await r.json())["status"] == "ok"
                # frontend pages are served: index + per-request status page
                # (reference status/[requestId].tsx + debug.tsx parity)
                async with sess.get(f"{base}/status.html") as r:
                    assert r.status == 200
                    page = await r.text()
                    assert "Per-miner scores" in page
                    assert "spot-check detail" in page
                # deposit via the faucet endpoint
                ph = prompt_commitment("make a video").hex()
                async with sess.post(f"{base}/deposit", json={
                    "user": "carol", "request_id": "api-1",
                    "prompt_hash": ph, "amount": 1000}) as r:
                    assert r.status == 200, await r.text()
                listener.poll_once()
                # wrong prompt rejected against the commitment
                async with sess.post(f"{base}/submit_prompt", json={
                    "request_id": "api-1", "prompt": "different"}) as r:
                    assert r.status == 400
                async with sess.post(f"{base}/submit_prompt", json={
                    "request_id": "api-1", "prompt": "make a video"}) as r:
                    assert r.status == 200
                async with sess.get(f"{base}/status/api-1") as r:
                    body = await r.json()
                    assert body["status"] == "pending" and body["has_prompt"]
                async with sess.get(f"{base}/result/api-1") as r:
                    assert r.status == 404  # no round run yet
                async with sess.post(f"{base}/refund/api-1") as r:
                    assert r.status == 200
                async with sess.get(f"{base}/status/unknown") as r:
                    assert r.status == 404
                # live-rounds feed (frontend status.html polls this): the
                # refunded round is listed with its lifecycle state and no
                # cleartext prompt is leaked
                async with sess.get(f"{base}/requests") as r:
                    body = await r.json()
                    assert r.status == 200
                    e = body["requests"]["api-1"]
                    assert e["status"] == "refunded" and e["user"] == "carol"
                    assert e["has_prompt"] is True and "prompt" not in e
                    # disk-only round joined with results summary
                    old = body["requests"]["old-9"]
                    assert old["status"] == "completed"
                    assert old["miners"] == 2 and old["cheats"] == 1
                    assert abs(old["top_score"] - 0.42) < 1e-9
                # wallet-grade signed deposit: account binds to the Ed25519
                # key (frontend commit-signing analog of the wagmi flow)
                from dvdx_tpu.verify.proof import Keypair

                ukp = Keypair.from_seed(b"web-user")
                ph2 = prompt_commitment("signed prompt").hex()
                msg = f"dvdx-deposit|api-2|{ph2}|500".encode()
                async with sess.post(f"{base}/deposit", json={
                    "user": "ignored-when-signed", "request_id": "api-2",
                    "prompt_hash": ph2, "amount": 500,
                    "pubkey": ukp.public_bytes.hex(),
                    "signature": ukp.sign(msg).hex()}) as r:
                    body = await r.json()
                    assert r.status == 200, body
                    assert body["user"] == f"ed25519:{ukp.public_bytes.hex()}"
                # a forged signature is rejected
                async with sess.post(f"{base}/deposit", json={
                    "user": "x", "request_id": "api-3",
                    "prompt_hash": ph2, "amount": 500,
                    "pubkey": ukp.public_bytes.hex(),
                    "signature": ("00" * 64)}) as r:
                    assert r.status == 403
                # neuron registration endpoints: the registry entry (and its
                # platform pin) must be signed by the key owner
                from dvdx_tpu.verify.proof import Keypair, sign_registration
                mkp = Keypair.from_seed(b"reg-test")
                sig, ts = sign_registration(mkp, "1.2.3.4:5", "miner", "",
                                            stake=7)
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": "1.2.3.4:5",
                    "stake": 7, "timestamp": ts, "signature": sig.hex()}) as r:
                    assert (await r.json())["uid"] == 0
                # unsigned (or wrongly signed) registration is rejected
                async with sess.post(f"{base}/register", json={
                    "pubkey": "aa" * 32, "address": "1.2.3.4:5",
                    "stake": 7}) as r:
                    assert r.status == 403
                # signature binds the platform pin: same key, different
                # platform than signed -> rejected (downgrade surface)
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": "1.2.3.4:5",
                    "stake": 7, "platform": "cpu", "timestamp": ts,
                    "signature": sig.hex()}) as r:
                    assert r.status == 403
                # signature binds the stake: a replayer cannot attach its own
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": "1.2.3.4:5",
                    "stake": 10**9, "timestamp": ts,
                    "signature": sig.hex()}) as r:
                    assert r.status == 403
                # a stale captured request stops replaying after the window
                old_sig, old_ts = sign_registration(
                    mkp, "1.2.3.4:5", "miner", "", stake=7,
                    timestamp=ts - 10_000)
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": "1.2.3.4:5",
                    "stake": 7, "timestamp": old_ts,
                    "signature": old_sig.hex()}) as r:
                    assert r.status == 403
                # malformed JSON value types -> 400, not a server error
                async with sess.post(f"{base}/register", json={
                    "pubkey": None, "address": "1.2.3.4:5"}) as r:
                    assert r.status == 400
                # hostile-but-plausible payloads stay 400 too: negative
                # stake (to_bytes overflow) and non-string address/role
                sig_n, ts_n = sign_registration(mkp, "1.2.3.4:5", "miner", "")
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": "1.2.3.4:5",
                    "stake": -1, "timestamp": ts_n,
                    "signature": sig_n.hex()}) as r:
                    assert r.status == 400
                async with sess.post(f"{base}/register", json={
                    "pubkey": mkp.public_bytes.hex(), "address": 5,
                    "timestamp": ts_n, "signature": sig_n.hex()}) as r:
                    assert r.status == 400
                async with sess.get(f"{base}/registry") as r:
                    snap = await r.json()
                    assert snap["0"]["stake"] == 7
        finally:
            await runner.cleanup()

    _run(go())


def test_claim_next_ready_atomic_vs_refund():
    """claim_next_ready transitions pending->processing atomically: a claimed
    request can't be auto-refunded, and queued (unclaimed) ones still can."""
    led = Ledger()
    listener = DepositListener(led, stuck_timeout_s=9999)
    for i in (1, 2):
        led.mint("u", 100)
        led.deposit_and_commit("u", f"q-{i}", prompt_commitment(f"p{i}"), 100)
    listener.poll_once()
    assert listener.attach_prompt("q-1", "p1")
    assert listener.attach_prompt("q-2", "p2")

    rid, prompt = listener.claim_next_ready()
    assert rid == "q-1" and prompt == "p1"
    # stuck-refund pass: the claimed request survives, the queued one refunds
    listener.stuck_timeout_s = 0.0
    listener.poll_once()
    assert listener.status_of("q-1")["status"] == "processing"
    assert listener.status_of("q-2")["status"] == "refunded"
    assert led.balance("u") == 100  # only q-2's escrow came back
    # nothing left to claim
    assert listener.claim_next_ready() is None
