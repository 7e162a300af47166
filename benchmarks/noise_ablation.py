"""Shared vs independent base-noise ablation.

The reference's legacy `ChunkingBenchmark` quantifies why chunks must share
one base noise field: independent per-chunk noise destroys boundary coherence
(`/root/reference/Distribution/legacy/Latent Chunking/shared_overlap_noise/
benchmark_chunking.py:23-192` + `analyse_benchmark.py`). This reproduces the
ablation on the TPU-native stack: generate the same video twice — (a) chunks
drawing their frames from the ONE counter-based noise field, (b) chunks with
per-chunk reseeded noise — and compare boundary temporal instability.

  python benchmarks/noise_ablation.py --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp
    import numpy as np

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.models.vae import decode_frames_tiled
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.ops.scheduler import make_ddim_schedule
    from dvdx_tpu.parallel.chunking import blend_chunks, gather_chunks, plan_chunks
    from dvdx_tpu.parallel.latent_chunking import chunk_bounds
    from dvdx_tpu.pipelines.text2video import build_pipeline, denoise
    from dvdx_tpu.scoring.temporal import boundary_pairs, temporal_instability
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline("zeroscope-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    ds = pipe.spec.vae.downscale
    lh = lw = args.size // ds
    c = pipe.latent_channels
    plan = plan_chunks(args.frames, args.chunks, overlap=2)
    sched = make_ddim_schedule(args.steps)
    ids = jnp.asarray(tokenize_batch(["", "a slow pan over a forest"],
                                     pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))

    @jax.jit
    def gen(params, token_ids, chunks_z0):
        hidden, _ = pipe.text_encoder.apply(params["text"], token_ids)
        uncond, cond = hidden[0:1], hidden[1:2]
        n = chunks_z0.shape[0]
        cond_n = jnp.broadcast_to(cond, (n,) + cond.shape[1:])
        uncond_n = jnp.broadcast_to(uncond, (n,) + uncond.shape[1:])
        zf = denoise(pipe.unet.apply, params["unet"], sched,
                     chunks_z0.astype(jnp.bfloat16), cond_n, uncond_n, 7.5)
        z = blend_chunks(zf[None].astype(jnp.float32), plan)[0]
        return decode_frames_tiled(pipe.vae_decoder.apply, params["vae_dec"], z)

    key = rng_ops.base_key(args.seed)

    # (a) shared base noise: every chunk slot reads THE noise field
    full = rng_ops.video_noise(key, args.frames, (lh, lw, c))
    shared = gather_chunks(full[None], plan)[0]

    # (b) independent noise: each chunk reseeds (what naive sharding would do)
    indep = jnp.stack([
        rng_ops.video_noise(jax.random.fold_in(key, 1000 + i),
                            plan.chunk_len, (lh, lw, c))
        for i in range(plan.num_chunks)
    ])

    pairs = boundary_pairs(chunk_bounds(plan))
    out = {}
    for name, z0 in [("shared", shared), ("independent", indep)]:
        frames = gen(pipe.params, ids, z0)
        video = np.asarray(((frames + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8))
        out[name] = {
            "boundary_temp_instab": round(temporal_instability(video, pairs), 5),
        }
    out["shared_is_better"] = (out["shared"]["boundary_temp_instab"]
                               <= out["independent"]["boundary_temp_instab"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
