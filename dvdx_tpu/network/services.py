"""Long-running neuron services: `python -m dvdx_tpu.network.services ...`.

The `python neurons/{miner,validator}.py` entry points of the reference
(`InferNet/neurons/miner.py:891+`, `neurons/validator.py` main): a miner
serves its axon and periodically resyncs; a validator runs deposit listener +
REST API + the forward loop.

  # terminal 1 — validator (hosts registry + REST API)
  python -m dvdx_tpu.network.services validator --api-port 8100 --model zeroscope-tiny

  # terminal 2..N — miners
  python -m dvdx_tpu.network.services miner --port 8201 \
      --validator-api 127.0.0.1:8100 --model zeroscope-tiny
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import signal
import sys
from typing import Optional

from ..pipelines.text2video import build_pipeline
from ..utils.testing import perturb_zero_params
from ..verify.proof import Keypair
from .api import create_app, serve_api
from .base import Registry
from .deposit_listener import DepositListener
from .http_transport import HttpTransport, serve_neuron
from .ledger import Ledger
from .miner import Miner
from .validator import Validator, ValidatorConfig


def _keypair(seed: Optional[str], default_tag: str) -> Keypair:
    return Keypair.from_seed((seed or default_tag).encode())


def _pipeline(model: str, perturb: bool, seed: int = 0, ckpt: str = ""):
    from ..pipelines.text2video import resolve_pipeline

    # `model` may be a registry name OR a diffusers checkpoint directory
    # (pretrained weights + tokenizer); see pipelines.resolve_pipeline
    pipe = resolve_pipeline(model, seed=seed)
    if ckpt:
        # shared weights via orbax checkpoint (the PoI determinism chain's
        # weight-distribution step; see utils/checkpoint)
        from ..utils.checkpoint import load_params

        pipe.params = load_params(ckpt, like=pipe.params)
    elif perturb:
        pipe.params = perturb_zero_params(pipe.params, seed=99)
    return pipe


async def run_miner(args):
    import aiohttp

    from .miner import MinerConfig

    pipe = _pipeline(args.model, args.perturb, ckpt=args.params_ckpt)
    kp = _keypair(args.key_seed, f"miner-{args.port}")
    registry = Registry()
    mcfg = MinerConfig(spool_dir=args.spool_dir) if args.spool_dir else None
    mesh = None
    if getattr(args, "mesh", ""):
        # e.g. --mesh 1,8,1 --mesh-strategy fsdp: PoI generation sharded
        # over this miner's chips (trace verifies on a 1-device validator)
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(tuple(int(x) for x in args.mesh.split(",")))
    miner = Miner(pipe, kp, registry, mcfg, mesh=mesh,
                  strategy=getattr(args, "mesh_strategy", "fsdp"))

    runner, port = await serve_neuron(miner.handle, args.host, args.port)
    address = f"{args.host}:{port}"
    print(f"[miner] serving at {address}, pubkey {kp.public_bytes.hex()[:16]}…")

    async def sync_loop():
        # register + periodically resync the registry snapshot
        # (BaseMinerNeuron run loop, template/base/miner.py:86-153)
        from ..verify.proof import sign_registration

        platform = miner.platform_tag  # backend, or backend:strategy (mesh)
        async with aiohttp.ClientSession() as sess:
            while True:
                try:
                    # fresh signature each sync: the signed timestamp bounds
                    # replay of captured registrations
                    reg_sig, reg_ts = sign_registration(
                        kp, address, "miner", platform, args.stake)
                    async with sess.post(
                        f"http://{args.validator_api}/register",
                        json={"pubkey": kp.public_bytes.hex(),
                              "address": address, "role": "miner",
                              "stake": args.stake,
                              "platform": platform,
                              "timestamp": reg_ts,
                              "signature": reg_sig.hex()},
                    ) as r:
                        uid = (await r.json()).get("uid")
                    async with sess.get(f"http://{args.validator_api}/registry") as r:
                        snap = await r.json()
                    registry.replace_all(snap)  # atomic swap under the lock
                    print(f"[miner] synced registry ({len(snap)} neurons), uid={uid}")
                    # metrics dump (the miner_metrics.json analog,
                    # reference neurons/miner.py:171-178)
                    with open("miner_metrics.json", "w") as f:
                        json.dump(miner.metrics, f)
                except Exception as e:
                    print(f"[miner] sync failed: {e}")
                await asyncio.sleep(args.sync_interval)

    task = asyncio.create_task(sync_loop())
    try:
        await asyncio.Event().wait()
    finally:
        task.cancel()
        await runner.cleanup()


async def run_validator(args):
    pipe = _pipeline(args.model, args.perturb, ckpt=args.params_ckpt)
    kp = _keypair(args.key_seed, "validator")
    registry = Registry()
    ledger = Ledger()
    listener = DepositListener(ledger, poll_interval_s=args.poll_interval,
                               stuck_timeout_s=args.stuck_timeout)
    transport = HttpTransport()
    vcfg = ValidatorConfig(
        sample_size=args.sample_size, num_checkpoints=args.num_checkpoints,
        width=args.width, height=args.height, num_frames=args.frames,
        num_steps=args.steps, results_dir=args.results_dir,
    )
    scorer = None
    if getattr(args, "clip_ckpt", "") or getattr(args, "lpips_ckpt", ""):
        # real pretrained scorers (the reference's
        # openai/clip-vit-base-patch32 + lpips(alex), scoring.py:69-151,269-309)
        from ..scoring.clip_score import CLIPScorer
        from ..scoring.mdvqs import MDVQS
        from ..utils.convert import load_clip_scorer, load_lpips

        clip = load_clip_scorer(args.clip_ckpt) if args.clip_ckpt \
            else CLIPScorer.build()
        lp = load_lpips(args.lpips_ckpt) if args.lpips_ckpt else None
        # same PF/VQ/TC weighting as the non-pretrained fallback scorer —
        # switching on pretrained towers must only swap the metric, not the
        # reward mix
        scorer = MDVQS(clip, alpha=vcfg.mdvqs_alpha, beta=vcfg.mdvqs_beta,
                       gamma=vcfg.mdvqs_gamma, lpips_metric=lp)
        print(f"[validator] MD-VQS scorers: clip={args.clip_ckpt or 'builtin'}"
              f" lpips={args.lpips_ckpt or 'proxy'}")
    validator = Validator(pipe, kp, registry, transport, ledger, vcfg,
                          scorer=scorer)
    validator.register(f"{args.host}:{args.api_port}", stake=10**9)

    listener.start()
    app = create_app(ledger, listener, registry, results_dir=args.results_dir)
    app["scorebook"] = validator.scores  # /weights observability endpoint
    runner, port = await serve_api(app, args.host, args.api_port)
    print(f"[validator] REST API at {args.host}:{port}; forward loop running")

    state_path = os.path.join(args.results_dir, "validator_state.npz")
    os.makedirs(args.results_dir, exist_ok=True)
    if args.resume and os.path.exists(state_path):
        validator.scores.load(state_path)
        print(f"[validator] resumed scores for {len(validator.scores.scores)} miners")

    # concurrent rounds (the concurrent_forward analog,
    # base/validator.py:110-131): up to --concurrency requests in flight.
    # A request is only claimed (pending -> processing, atomic under the
    # listener lock) once a slot is free, so queued requests stay 'pending'
    # and remain eligible for the stuck-timeout auto-refund.
    sem = asyncio.Semaphore(max(1, args.concurrency))
    tasks: dict = {}  # rid -> task (strong refs; loop holds only weak ones)

    async def one_round(rid, prompt):
        try:
            print(f"[validator] round for {rid}: {prompt[:60]!r}")
            try:
                report = await validator.run_round(rid, prompt)
                ok = any(not d.get("cheat") and d["score"] > 0
                         for d in report.get("miners", {}).values())
                listener.set_status(rid, "completed" if ok else "failed")
                validator.scores.save(state_path)
                with open(os.path.join(args.results_dir,
                                       "validator_metrics.json"), "w") as f:
                    json.dump(validator.metrics, f)
            except Exception as e:
                print(f"[validator] round failed: {e}")
                listener.set_status(rid, "failed")
        finally:
            tasks.pop(rid, None)
            sem.release()

    try:
        while True:
            await sem.acquire()
            claimed = listener.claim_next_ready()
            if claimed is None:
                sem.release()
                await asyncio.sleep(args.poll_interval)
                continue
            rid, prompt = claimed
            tasks[rid] = asyncio.create_task(one_round(rid, prompt))
    finally:
        pending = list(tasks.values())
        if pending:
            # let in-flight rounds finish (miners already did the work)
            await asyncio.gather(*pending, return_exceptions=True)
        listener.stop()
        await transport.close()
        await runner.cleanup()


def build_parser():
    ap = argparse.ArgumentParser(description="dvdx network services")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    sub = ap.add_subparsers(dest="role", required=True)

    m = sub.add_parser("miner")
    m.add_argument("--host", default="127.0.0.1")
    m.add_argument("--port", type=int, default=8201)
    m.add_argument("--validator-api", default="127.0.0.1:8100")
    m.add_argument("--model", default="zeroscope-tiny")
    m.add_argument("--perturb", action="store_true")
    m.add_argument("--key-seed", default=None)
    m.add_argument("--stake", type=int, default=10_000)
    m.add_argument("--sync-interval", type=float, default=30.0)
    m.add_argument("--spool-dir", default="miner_spool",
                   help="disk spool for reveal-able traces ('' disables)")
    m.add_argument("--params-ckpt", default="",
                   help="orbax checkpoint of shared model weights")
    m.add_argument("--mesh", default="",
                   help="data,model,seq mesh shape (e.g. 1,8,1) — PoI "
                        "generation sharded over this miner's local chips")
    m.add_argument("--mesh-strategy", default="fsdp",
                   choices=["fsdp", "cp_exact"],
                   help="sharding for --mesh (value-preserving only)")

    v = sub.add_parser("validator")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--api-port", type=int, default=8100)
    v.add_argument("--model", default="zeroscope-tiny")
    v.add_argument("--perturb", action="store_true")
    v.add_argument("--key-seed", default=None)
    v.add_argument("--sample-size", type=int, default=3)
    v.add_argument("--num-checkpoints", type=int, default=3)
    v.add_argument("--width", type=int, default=128)
    v.add_argument("--height", type=int, default=128)
    v.add_argument("--frames", type=int, default=3)
    v.add_argument("--steps", type=int, default=8)
    v.add_argument("--lpips-ckpt", default="",
                   help="lpips(alex) checkpoint (.pth/.safetensors) — "
                        "pretrained perceptual VQ term")
    v.add_argument("--clip-ckpt", default="",
                   help="transformers CLIPModel checkpoint dir — pretrained "
                        "MD-VQS scoring (utils.convert.load_clip_scorer)")
    v.add_argument("--poll-interval", type=float, default=2.0)
    v.add_argument("--concurrency", type=int, default=1)
    v.add_argument("--stuck-timeout", type=float, default=600.0)
    v.add_argument("--results-dir", default="generated_videos")
    v.add_argument("--resume", action="store_true")
    v.add_argument("--params-ckpt", default="",
                   help="orbax checkpoint of shared model weights")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dvdx_jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    coro = run_miner(args) if args.role == "miner" else run_validator(args)
    try:
        asyncio.run(coro)
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
