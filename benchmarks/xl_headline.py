"""The reference's headline workload on one chip: Zeroscope-XL,
1024x576, 24 frames, 50 DDIM steps (reference benchmark geometry,
`/root/reference/Distribution/strategies/fsdp_chunked.py:329-338`; its cost
model measures 3.3 s/step on an A100 => 165 s/video).

Single 16 GB v5e chip needs bf16 params + sequential CFG (cfg_split) to fit.

  python benchmarks/xl_headline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import build_pipeline, build_segmented_runner

    pipe = build_pipeline("zeroscope-v2-xl", seed=0)
    # segmented launches: the full 50-step scan is ~90 s of device time in one
    # execution, which exceeds the runtime's RPC execution window — 10-step
    # segments are bitwise-identical and bound each launch to ~20 s
    run = build_segmented_runner(pipe, num_frames=24, height=576, width=1024,
                                 num_steps=50, guidance_scale=7.5,
                                 segment_steps=10, cfg_split=True)
    ids = jnp.asarray(tokenize_batch(["", "a sailboat in a storm"],
                                     pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(7)
    params = jax.device_put(pipe.params)

    def force(x):
        # block_until_ready can return before execution finishes on the
        # tunnelled runtime (CLAUDE.md timing gotcha) — end with a real
        # host fetch
        return float(jnp.sum(x[::5].astype(jnp.float32)))

    t0 = time.time()
    force(run(params, ids, key))
    compile_s = time.time() - t0
    t0 = time.time()
    force(run(params, ids, key))
    sec = time.time() - t0
    print(json.dumps({
        "workload": "zeroscope-XL 24f@1024x576, 50 steps, 1 chip (cfg_split)",
        "sec_per_video": round(sec, 2),
        "vs_a100_165s": round(165.0 / sec, 2),
        "sec_per_step": round(sec / 50, 3),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
