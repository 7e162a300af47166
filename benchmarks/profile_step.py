"""Profile one UNet CFG denoise step on the real TPU and aggregate device-op
time by kind (conv / attention matmuls / FF matmuls / elementwise / copies).

VERDICT r1 item 4 asks for trace evidence of where the step time goes before
any conv-MXU fix is attempted; the aggregated table is committed to
docs/PERF_NOTES.md.

  python -u benchmarks/profile_step.py [--trace-dir /tmp/dvdx_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir: str) -> dict:
    """Parse the perfetto trace JAX writes and sum device-op durations."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device track pids (names like "/device:TPU:0" or "TPU:0")
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name.upper() or "device" in name.lower():
                device_pids.add(e["pid"])
    buckets = collections.Counter()
    op_times = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "")
        low = name.lower()
        # order matters: 'convert_reduce_fusion' is a conv+norm-stats MEGA
        # fusion (hlo_category 'convolution fusion'), not a bare convert —
        # and module-scoped custom-call names (attn1.*, ff.*) must not fall
        # into 'other' (round-3b fix: the old 'conv in name' test also
        # swallowed every convert_* op).
        if "jit_step" in low or "jit(" in low:
            b = "trace-parent"   # parent span; excluding avoids double count
        elif "attn" in low or "flash" in low:
            b = "attention(custom)"
        elif low.startswith("ff") or "geglu" in low:
            b = "ff(custom)"
        elif "custom" in low or "pallas" in low:
            b = "pallas/custom"
        elif "convert_reduce" in low:
            b = "conv+norm-stats fusion"
        elif "convolution" in low or low.startswith("conv"):
            b = "conv"
        elif "dot" in low or "matmul" in low or "gemm" in low:
            b = "matmul"
        elif "fusion" in low or "multiply" in low or "add" in low or "loop" in low:
            b = "fusion/elementwise"
        elif "copy" in low or "transpose" in low or "reshape" in low or "bitcast" in low:
            b = "copy/layout"
        elif "all-" in low or "collective" in low:
            b = "collective"
        else:
            b = "other"
        if b == "trace-parent":
            continue
        buckets[b] += dur
        op_times[name[:80]] += dur
        total += dur
    return {"total_device_s": round(total, 4),
            "buckets": {k: round(v, 4) for k, v in buckets.most_common()},
            "top_ops": {k: round(v, 4) for k, v in op_times.most_common(25)}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/dvdx_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--geometry", choices=("std", "xl"), default="std",
                    help="std = 16f@576x320/25 steps (CFG batched); "
                         "xl = 24f@1024x576/50 steps (cfg_split, the "
                         "flagship benchmark geometry)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.verify.spotcheck import StepEngine

    pipe = build_pipeline("zeroscope-v2-576w", seed=0)
    engine = StepEngine(pipe)
    params = jax.device_put(pipe.params)
    ids = jnp.asarray(pipe.tokenize(["", "profile"]))
    uncond, cond = engine.encode_fn()(params, ids)
    if args.geometry == "xl":
        num_steps, cfg_split, f, lh, lw = 50, True, 24, 72, 128
    else:
        num_steps, cfg_split, f, lh, lw = 25, False, 16, 40, 72
    step, _ = engine.step_fn(num_steps, 7.5, cfg_split=cfg_split)
    z = engine.noise_fn(f, lh, lw, 4)(rng_ops.base_key(0))[None].astype(jnp.bfloat16)
    jax.block_until_ready(step(params, z, jnp.int32(0), cond, uncond))  # warm

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            jax.block_until_ready(step(params, z, jnp.int32(i), cond, uncond))
    time.sleep(1)
    print(json.dumps(aggregate_trace(args.trace_dir)))


if __name__ == "__main__":
    main()
