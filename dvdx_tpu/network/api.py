"""User-facing REST prompt API (aiohttp) — the Flask prompt_api analog.

Endpoints (parity with `/root/reference/InferNet/api/prompt_api.py:15-212`):
  POST /submit_prompt {request_id, prompt}  — verify the on-ledger prompt
        commitment, attach the cleartext prompt, wait (<=120 s) for the
        deposit to be visible
  GET  /status/<id>      — request lifecycle state
  GET  /result/<id>      — the validator's results JSON (video paths -> URLs)
  GET  /videos/<file>    — mp4 serving
  POST /refund/<id>      — manual refund of a stuck request
  GET  /health
plus infra endpoints the chainless deployment needs:
  POST /register {pubkey, address, role, stake, platform, signature} —
        neuron registration (the subtensor-registration analog); signature
        is Ed25519 over verify.proof.registration_message so the platform
        pin is bound to the key owner
  GET  /registry — metagraph snapshot for miners' sync loops
  POST /deposit {user, request_id, prompt_hash, amount} — dev/test faucet
        path standing in for the on-chain depositAndCommit transaction
"""

from __future__ import annotations

import asyncio
import json
import os
import time
from typing import Optional

from aiohttp import web

from .base import Registry
from .deposit_listener import DepositListener
from .ledger import Ledger, LedgerError


def create_app(ledger: Ledger, listener: DepositListener, registry: Registry,
               results_dir: str = "generated_videos",
               submit_wait_s: float = 120.0) -> web.Application:
    app = web.Application()

    def cors(resp: web.StreamResponse) -> web.StreamResponse:
        resp.headers["Access-Control-Allow-Origin"] = "*"
        return resp

    async def submit_prompt(request: web.Request):
        try:
            body = await request.json()
        except Exception:
            return cors(web.json_response({"error": "invalid JSON"}, status=400))
        rid = body.get("request_id")
        prompt = body.get("prompt")
        if not rid or not prompt:
            return cors(web.json_response(
                {"error": "request_id and prompt required"}, status=400))
        # wait for the deposit event to be seen (reference waits <=120 s,
        # api/prompt_api.py:39-58)
        deadline = time.time() + submit_wait_s
        while listener.status_of(rid) is None and time.time() < deadline:
            await asyncio.sleep(0.1)
        if listener.status_of(rid) is None:
            return cors(web.json_response(
                {"error": "no deposit found for request"}, status=404))
        if not listener.attach_prompt(rid, prompt):
            return cors(web.json_response(
                {"error": "prompt does not match on-ledger commitment"},
                status=400))
        return cors(web.json_response({"status": "accepted", "request_id": rid}))

    async def status(request: web.Request):
        rid = request.match_info["rid"]
        entry = listener.status_of(rid)
        if entry is None:
            return cors(web.json_response({"error": "unknown request"}, status=404))
        return cors(web.json_response({
            "request_id": rid, "status": entry["status"],
            "has_prompt": bool(entry["prompt"]),
        }))

    async def result(request: web.Request):
        rid = request.match_info["rid"]
        path = os.path.join(results_dir, f"results_{rid}.json")
        if not os.path.exists(path):
            return cors(web.json_response({"error": "no results yet"}, status=404))
        with open(path) as f:
            data = json.load(f)
        # rewrite any video paths to URLs (prompt_api.py:118-150)
        for m in data.get("miners", {}).values():
            if "video_path" in m:
                m["video_url"] = f"/videos/{os.path.basename(m['video_path'])}"
        return cors(web.json_response(data))

    async def videos(request: web.Request):
        fname = os.path.basename(request.match_info["fname"])
        path = os.path.join(results_dir, fname)
        if not os.path.exists(path):
            return cors(web.json_response({"error": "not found"}, status=404))
        return cors(web.FileResponse(path))

    async def refund(request: web.Request):
        rid = request.match_info["rid"]
        try:
            if listener.status_of(rid) is not None:
                # known to the listener: refund only while still 'pending'
                # (a claimed round must finish and pay its miners)
                if not listener.try_refund(rid):
                    return cors(web.json_response(
                        {"error": "request is processing or finished"},
                        status=409))
            else:
                ledger.refund_unused("validator", rid)
            return cors(web.json_response({"status": "refunded"}))
        except LedgerError as e:
            return cors(web.json_response({"error": str(e)}, status=400))

    async def health(_request):
        return cors(web.json_response({
            "status": "ok",
            "active_requests": len(listener.active_requests),
            "miners": len(registry.miners()),
            "block": ledger.block,
        }))

    async def register(request: web.Request):
        body = await request.json()
        try:
            stake = int(body.get("stake", 0))
            if not 0 <= stake < 2**63:
                raise ValueError(f"stake out of range: {stake}")
            pubkey = bytes.fromhex(body["pubkey"])
            address = body["address"]
            role = body.get("role", "miner")
            if not isinstance(address, str) or not isinstance(role, str):
                raise ValueError("address/role must be strings")
            platform = str(body.get("platform", ""))
            # the registry entry (address routing + the platform pin that
            # decides bitwise-vs-tolerance verification) belongs to the key
            # owner: require an Ed25519 signature over the canonical
            # registration message — an unauthenticated pin is exactly the
            # downgrade/impersonation surface of ADVICE r1 / review r2. The
            # message binds stake (a replayer cannot attach its own) and a
            # timestamp (a captured request stops replaying after
            # REGISTRATION_MAX_AGE_S).
            from ..verify.proof import verify_registration_signature

            sig = bytes.fromhex(body.get("signature", ""))
            ts = int(body.get("timestamp", 0))
            if not verify_registration_signature(pubkey, address,
                                                 role, platform, stake, ts,
                                                 sig):
                return cors(web.json_response(
                    {"error": "invalid or stale registration signature"},
                    status=403))
            uid = registry.register(pubkey, address, role, stake,
                                    platform=platform)
            # dev-faucet semantics: mirror the declared stake onto the ledger
            # so record_submission's staked-miner requirement holds (a real
            # deployment replaces this with an on-chain stake transaction)
            account = f"miner-{uid}"
            if body.get("role", "miner") == "miner" and \
                    stake > ledger.stake_of(account):
                delta = stake - ledger.stake_of(account)
                ledger.mint(account, delta)
                ledger.stake(account, delta)
        except (KeyError, ValueError, TypeError, OverflowError,
                AttributeError) as e:
            # a public endpoint must map hostile JSON to 400, not 500:
            # TypeError/AttributeError for wrong value types, OverflowError
            # for out-of-range ints that slip past validation
            return cors(web.json_response({"error": str(e)}, status=400))
        return cors(web.json_response({"uid": uid}))

    async def registry_snapshot(_request):
        return cors(web.Response(text=registry.to_json(),
                                 content_type="application/json"))

    async def deposit(request: web.Request):
        body = await request.json()
        try:
            user = body["user"]
            amount = int(body["amount"])
            prompt_hash = bytes.fromhex(body["prompt_hash"])  # validate first
            rid = body["request_id"]
            # wallet-grade commit signing (the wagmi/viem-flow analog,
            # reference frontend/pages/index.tsx:23-90): when the client
            # supplies an Ed25519 pubkey+signature over the canonical
            # commitment message, the deposit account is BOUND to that key —
            # refunds/results belong to the key holder, not a claimed name.
            if body.get("pubkey") or body.get("signature"):
                from ..verify.proof import verify_signature

                pub = bytes.fromhex(body["pubkey"])
                sig = bytes.fromhex(body["signature"])
                msg = f"dvdx-deposit|{rid}|{prompt_hash.hex()}|{amount}".encode()
                if not verify_signature(pub, msg, sig):
                    return cors(web.json_response(
                        {"error": "bad deposit signature"}, status=403))
                user = f"ed25519:{pub.hex()}"
            ledger.mint(user, amount)
            try:
                ledger.deposit_and_commit(user, rid, prompt_hash, amount)
            except LedgerError:
                ledger.burn(user, amount)  # roll the faucet mint back
                raise
        except (KeyError, ValueError, LedgerError) as e:
            return cors(web.json_response({"error": str(e)}, status=400))
        return cors(web.json_response({"status": "deposited", "user": user}))

    async def index(_request):
        page = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "frontend", "index.html")
        if os.path.exists(page):
            return web.FileResponse(page)
        return web.json_response({"service": "dvdx validator API"})

    async def status_page(_request):
        # per-request score/spot-check breakdown + debug view (the reference's
        # status/[requestId].tsx and debug.tsx pages)
        page = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "frontend", "status.html")
        if os.path.exists(page):
            return web.FileResponse(page)
        return web.json_response({"error": "status page not installed"}, status=404)

    async def weights(_request):
        # on-chain weight emission view (set_weights analog,
        # base/validator.py:187-291): kappa-clipped normalised + u16, plus
        # the chain-recorded epoch/vector when a ledger is wired in (the
        # durable artifact Validator.emit_weights writes each round)
        sb = app.get("scorebook")
        body = {"weights": {}, "u16": {}}
        if sb is not None:
            body = {"weights": sb.weights(), "u16": sb.weights_u16()}
        if ledger is not None and hasattr(ledger, "weights_epoch") \
                and not callable(ledger.weights_epoch):
            body["onchain"] = {"epoch": ledger.weights_epoch,
                               "weights": dict(ledger.weights)}
        return cors(web.json_response(body))

    async def requests_list(_request):
        """Live-rounds feed for the frontend (status.html polls this): every
        request the deposit listener tracks, joined with the on-disk round
        results (miner count / top score / cheats) once a round completes.
        The reference frontend can only poll one requestId at a time
        (`frontend/pages/status/[requestId].tsx`)."""
        out = listener.all_requests()
        import glob as _glob

        for path in _glob.glob(os.path.join(results_dir, "results_*.json")):
            rid = os.path.basename(path)[len("results_"):-len(".json")]
            entry = out.setdefault(rid, {"status": "completed"})
            try:
                with open(path) as f:
                    data = json.load(f)
                miners = data.get("miners", {})
                scores = [m.get("score", 0.0) for m in miners.values()]
                entry["miners"] = len(miners)
                entry["top_score"] = max(scores) if scores else 0.0
                entry["cheats"] = sum(1 for m in miners.values()
                                      if m.get("cheat"))
                entry["has_results"] = True
            except Exception:
                entry["has_results"] = False
        return cors(web.json_response(
            {"requests": out, "count": len(out)}))

    app.router.add_get("/", index)
    app.router.add_get("/requests", requests_list)
    app.router.add_get("/status.html", status_page)
    app.router.add_get("/weights", weights)
    app.router.add_post("/submit_prompt", submit_prompt)
    app.router.add_get("/status/{rid}", status)
    app.router.add_get("/result/{rid}", result)
    app.router.add_get("/videos/{fname}", videos)
    app.router.add_post("/refund/{rid}", refund)
    app.router.add_get("/health", health)
    app.router.add_post("/register", register)
    app.router.add_get("/registry", registry_snapshot)
    app.router.add_post("/deposit", deposit)
    return app


async def serve_api(app: web.Application, host: str = "127.0.0.1",
                    port: int = 0) -> tuple:
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    actual_port = site._server.sockets[0].getsockname()[1]
    return runner, actual_port
