"""Benchmark: flagship Zeroscope-class text->video on real TPU.

North-star workload (BASELINE.json): 16 frames @ 576x320, 25 DDIM steps,
CFG 7.5 — full pipeline (text encode + scan'd CFG denoise + VAE decode).

Baseline comparison: the reference measures 3.3 s/UNet-step on an A100 at its
576x1024, 24-frame workload (`/root/reference/Economics/core/security_analysis.py:8-10`).
Scaling linearly by pixel-frames to our 576x320x16 config gives
3.3 * (320*16)/(1024*24) = 0.6875 s/step -> 17.19 s for 25 steps. This is a
conservative (attention is super-linear) single-A100 denoise-only baseline;
our measured value additionally includes text encoding and VAE decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_SEC = 3.3 * (320 * 16) / (1024 * 24) * 25  # 17.19 s/video

NUM_FRAMES = 16
HEIGHT, WIDTH = 320, 576
NUM_STEPS = 25


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import build_pipeline

    dev = jax.devices()[0]
    t0 = time.time()
    pipe = build_pipeline("zeroscope-v2-576w", seed=0)
    init_s = time.time() - t0

    fn, sched = pipe.generator(NUM_FRAMES, HEIGHT, WIDTH, NUM_STEPS,
                               guidance_scale=7.5, context_weight=0.0, record=False)
    ids = jnp.asarray(tokenize_batch(["", "a red panda climbing a tree"],
                                     pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
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
    for i in range(2):
        t0 = time.time()
        frames = fn(params, ids, key)
        jax.block_until_ready(frames)
        times.append(time.time() - t0)
    sec_per_video = min(times)

    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {
            "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 3),
            "hbm_gb": round(stats.get("bytes_in_use", 0) / 2**30, 3),
        }
    except Exception:
        pass

    # Proof-of-Inference verify overhead: k=3 exact step re-executions vs the
    # 25-step denoise (target < 10%, BASELINE.md)
    verify = {}
    try:
        from dvdx_tpu.verify.spotcheck import StepEngine

        engine = StepEngine(pipe)
        uncond, cond = engine.encode_fn()(params, ids)
        step, _ = engine.step_fn(NUM_STEPS, 7.5)
        z = engine.noise_fn(NUM_FRAMES, HEIGHT // 8, WIDTH // 8, 4)(key)
        z = z[None].astype(jnp.bfloat16)
        jax.block_until_ready(step(params, z, jnp.int32(0), cond, uncond))  # compile
        t0 = time.time()
        for i in range(3):
            jax.block_until_ready(step(params, z, jnp.int32(i), cond, uncond))
        reexec_s = time.time() - t0
        verify = {
            "spotcheck_reexec_s": round(reexec_s, 3),
            "verify_overhead_pct": round(100 * reexec_s / sec_per_video, 2),
            # fraction of denoise steps re-executed (the reference's <10%
            # claim is this ratio at its T=30 config; at the XL 50-step
            # workload k=3 -> 6%)
            "verify_steps_fraction": round(3 / NUM_STEPS, 3),
        }
    except Exception as e:
        verify = {"verify_error": str(e)[:120]}

    result = {
        "metric": "sec/video (zeroscope-576w 16f@576x320, 25 steps, 1 chip)",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(A100_BASELINE_SEC / sec_per_video, 3),
        "frames_per_sec_per_chip": round(NUM_FRAMES / sec_per_video, 3),
        "compile_plus_first_s": round(compile_and_first_s, 1),
        "init_s": round(init_s, 1),
        "weights_transfer_s": round(put_s, 1),
        "baseline_sec": round(A100_BASELINE_SEC, 2),
        "device": str(dev),
        **mem,
        **verify,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
