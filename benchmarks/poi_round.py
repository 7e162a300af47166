"""End-to-end Proof-of-Inference round at production scale on real TPU.

Measures the TRUE verify overhead: a miner generates (PoI-grade, recorded)
and a validator fully verifies (signature, Merkle, base noise, bitwise
re-execution, video binding, MD-VQS) — wall-clock both sides.

  python benchmarks/poi_round.py [--steps 25] [--frames 16]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="zeroscope-v2-576w")
    ap.add_argument("--width", type=int, default=576)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--checkpoints", type=int, default=3)
    ap.add_argument("--cfg-split", action="store_true",
                    help="sequential-CFG step program (XL geometry on one "
                         "16 GB chip); pinned in the request, honoured by "
                         "both prover and verifier")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = "/root/repo/.jax_cache" if args.cpu else "/root/repo/.jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig
    from dvdx_tpu.pipelines.text2video import resolve_pipeline

    # registry name OR a (converted) diffusers checkpoint directory — the
    # full-scale synthetic-checkpoint PoI round (VERDICT r4 item 5) passes
    # benchmarks/convert_fullscale.py's --keep dir here
    pipe = resolve_pipeline(args.model, seed=0)
    cfg = ValidatorConfig(sample_size=1, num_checkpoints=args.checkpoints,
                          num_frames=args.frames, width=args.width,
                          height=args.height, num_steps=args.steps,
                          cfg_split=args.cfg_split,
                          timeout_s=3600.0)  # cold compiles exceed the default
    net = build_mock_network(n_miners=1, pipeline=pipe, validator_config=cfg)

    # warm both programs (compile excluded, like all benchmarks here)
    asyncio.new_event_loop().run_until_complete(
        net.run_request("warmup", "warmup prompt"))

    t0 = time.time()
    report = asyncio.new_event_loop().run_until_complete(
        net.run_request("poi-bench", "a red panda climbing a snowy tree"))
    total_s = time.time() - t0
    d = report["miners"]["0"]
    gen_s = d.get("gen_time_s", 0.0)
    print(json.dumps({
        "workload": f"{args.model} {args.frames}f@{args.width}x{args.height}, "
                    f"{args.steps} steps, k={args.checkpoints}",
        "round_total_s": round(total_s, 2),
        "miner_gen_s": round(gen_s, 2),
        "verify_s": round(total_s - gen_s, 2),
        "verify_overhead_pct": round(100 * (total_s - gen_s) / max(gen_s, 1e-9), 1),
        "score": round(d["score"], 3),
        "reexec_bitwise": d.get("reexec_bitwise"),
        "video_binding_err": d.get("video_binding_err"),
        "checks": {k: v for k, v in d["checks"].items()},
        "video_bytes": d.get("video_bytes"),
        "verify_phase_s": d.get("timings_s", {}),
        "mdvqs_phase_s": d.get("mdvqs", {}).get("timings_s", {}),
        "miner_phase_s": d.get("miner_timings_s", {}),
    }))
    if not all(d["checks"].values()):   # full diagnostics on any failure
        print("FAIL DETAIL:", json.dumps(
            {k: v for k, v in d.items()
             if isinstance(v, (str, int, float, bool, type(None)))}))


if __name__ == "__main__":
    main()
