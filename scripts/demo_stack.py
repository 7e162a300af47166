"""One-process live demo stack: REST API + deposit listener + in-process
miner/validator round loop, for driving the web frontend against real
services without orchestrating three shells.

    python -u scripts/demo_stack.py [--port 8100] [--miners 2]
    # then open http://127.0.0.1:8100/ (index) and /status.html

Every layer is real except the sockets between neuron roles (MockTransport):
real Ed25519 identities, real PoI generation + verification rounds, real
ledger settlement — the same wiring tests/test_frontend_dom.py replays.
"""

import argparse
import asyncio
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


async def run(args):
    from dvdx_tpu.network.api import create_app, serve_api
    from dvdx_tpu.network.deposit_listener import DepositListener
    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline(args.model, seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    cfg = ValidatorConfig(sample_size=args.miners, num_checkpoints=2,
                          num_frames=args.frames, width=args.size,
                          height=args.size, num_steps=args.steps,
                          results_dir=args.results_dir)
    adversaries = [a for a in args.adversaries.split(",") if a]
    net = build_mock_network(n_miners=args.miners, adversaries=adversaries,
                             pipeline=pipe, validator_config=cfg)
    listener = DepositListener(net.ledger, stuck_timeout_s=3600)
    app = create_app(net.ledger, listener, net.registry,
                     results_dir=args.results_dir)
    runner, port = await serve_api(app, host=args.host, port=args.port)
    print(f"demo stack up: http://{args.host}:{port}/  "
          f"({args.miners} miners{' + ' + args.adversaries if adversaries else ''})",
          flush=True)

    loop = asyncio.get_event_loop()
    while True:
        listener.poll_once()
        claimed = listener.claim_next_ready()
        if claimed is None:
            await asyncio.sleep(0.5)
            continue
        rid, prompt = claimed
        print(f"round start: {rid!r} prompt={prompt!r}", flush=True)
        try:
            # the round's jitted compute is synchronous — run it on a worker
            # thread (own event loop) so the HTTP server stays responsive
            report = await loop.run_in_executor(
                None, lambda: asyncio.run(net.validator.run_round(rid, prompt)))
            listener.set_status(rid, "completed")
            print(f"round done: {rid!r} scores="
                  f"{ {u: round(d['score'], 3) for u, d in report['miners'].items()} }",
                  flush=True)
        except Exception as e:
            listener.set_status(rid, "failed")
            print(f"round FAILED: {rid!r}: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8100)
    ap.add_argument("--miners", type=int, default=2)
    ap.add_argument("--adversaries", default="",
                    help="comma list: lazy | wrong_seed | wrong_video | approx")
    ap.add_argument("--model", default="zeroscope-tiny")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--results-dir", default="generated_videos")
    args = ap.parse_args()
    asyncio.new_event_loop().run_until_complete(run(args))


if __name__ == "__main__":
    main()
