"""Chunk worker process: denoise one frame range, write the latent chunk.

The reference's legacy multi-machine path ships pickled chunks to worker
subprocesses (`/root/reference/Distribution/legacy/Latent Chunking/
distributed_worker.py:21-156`) or XML-RPC services
(`precond_overlap/run_worker.py:11-70`). Here a worker derives its OWN input
from (seed, frame range) — counter-based noise means no input tensor ever
crosses the process boundary; only the result chunk comes back (npz).

  python -m dvdx_tpu.parallel.worker --seed 7 --start 4 --length 6 \
      --model zeroscope-tiny --out chunk1.npz --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="dvdx chunk worker")
    ap.add_argument("--model", default="zeroscope-tiny")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--start", type=int, required=True)
    ap.add_argument("--length", type=int, required=True)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--out", default="")
    ap.add_argument("--send-to", default="",
                    help="host:port — stream the result chunk over a real "
                         "TCP socket instead of (or besides) the npz file; "
                         "the coordinator measures actual payload bytes and "
                         "transfer time (reference chunk_only.py:126-134 "
                         "measures its pickled gather the same way)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--perturb", action="store_true")
    ap.add_argument("--param-seed", type=int, default=0)
    args = ap.parse_args(argv)
    if not args.out and not args.send_to:
        ap.error("need --out and/or --send-to")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dvdx_jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp
    import numpy as np

    from ..models.text_encoder import tokenize_batch
    from ..ops import rng as rng_ops
    from ..ops.scheduler import make_ddim_schedule
    from ..pipelines.text2video import build_pipeline, denoise
    from ..utils.testing import perturb_zero_params

    t0 = time.time()
    pipe = build_pipeline(args.model, seed=args.param_seed)
    if args.perturb:
        pipe.params = perturb_zero_params(pipe.params, seed=99)

    ds = pipe.spec.vae.downscale
    lh, lw = args.height // ds, args.width // ds
    c = pipe.latent_channels

    ids = tokenize_batch([args.negative_prompt, args.prompt],
                         pipe.spec.text.vocab_size, pipe.spec.text.max_length)
    sched = make_ddim_schedule(args.steps)

    @jax.jit
    def run(params, token_ids, key):
        hidden, _ = pipe.text_encoder.apply(params["text"], token_ids)
        uncond, cond = hidden[0:1], hidden[1:2]
        # shard-local shared base noise: frames [start, start+length)
        z0 = rng_ops.frame_range_noise(key, args.start, args.length,
                                       (lh, lw, c), jnp.float32)
        z0 = z0[None].astype(jnp.bfloat16)
        return denoise(pipe.unet.apply, params["unet"], sched, z0, cond,
                       uncond, args.guidance)

    z = run(pipe.params, jnp.asarray(ids), rng_ops.base_key(args.seed))
    z = np.asarray(z[0], np.float32)
    sent_bytes = 0
    if args.out:
        np.savez(args.out, latent=z, start=args.start, length=args.length,
                 seed=args.seed, steps=args.steps)
    if args.send_to:
        import io
        import socket
        import struct

        buf = io.BytesIO()
        np.savez(buf, latent=z, start=args.start, length=args.length,
                 seed=args.seed, steps=args.steps)
        payload = buf.getvalue()
        host, port = args.send_to.rsplit(":", 1)
        with socket.create_connection((host, int(port)), timeout=60) as s:
            s.sendall(b"DVDXCHNK" + struct.pack(">II", args.start, len(payload)))
            s.sendall(payload)
        sent_bytes = len(payload)
    print(json.dumps({"worker": "ok", "out": args.out or args.send_to,
                      "frames": [args.start, args.start + args.length],
                      "sent_bytes": sent_bytes,
                      "elapsed_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
