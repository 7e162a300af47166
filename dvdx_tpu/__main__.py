"""dvdx umbrella CLI — every framework entry point under one command.

    python -m dvdx_tpu <command> [args...]

Commands (each delegates to the module CLI, so `python -m dvdx_tpu miner
--help` == `python -m dvdx_tpu.network.services miner --help`):

  generate     one-shot text -> video -> mp4 (the reference user's primary
               action: `InferNet/neurons/miner.py` generation loop as a CLI)
  miner        serve a miner neuron        (network.services)
  validator    serve a validator + its REST API (network.services; the API
               runs inside the validator, as in the reference)
  mock-round   full in-process network demo round (network.mock)
  strategy     single-process distributed-strategy benchmark (parallel.runner)
  coordinator  multi-process chunk coordinator (parallel.coordinator)
  convert      diffusers checkpoint -> Flax (utils.convert)
  keys         keygen / sign / verify      (verify.cli)
  econ         economics pipeline          (economics.run)

The reference scatters these across `neurons/*.py`, `strategies/*.py`,
`evm/`, `Economics/` scripts; here one binary surface covers the stack.
"""

from __future__ import annotations

import os
import sys


def _generate(argv):
    import argparse
    import time

    ap = argparse.ArgumentParser(
        prog="python -m dvdx_tpu generate",
        description="text -> video -> mp4 on the current JAX backend")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--model", default="zeroscope-v2-576w",
                    help="registry name or diffusers checkpoint dir")
    ap.add_argument("--out", default="out.mp4")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=0, help="0 = model default")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--guidance-scale", type=float, default=-1.0)
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--cfg-split", action="store_true",
                    help="sequential CFG halves activation memory (XL on one "
                         "16 GB chip)")
    ap.add_argument("--segment-steps", type=int, default=0,
                    help=">0: segmented launches (long schedules through "
                         "runtimes that bound single-execution time)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--perturb", action="store_true",
                    help="perturb zero-init mixers (signal without weights)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # absolute cache path: a cwd-relative dir would cold-compile (minutes)
    # whenever the CLI runs outside the repo root
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu_backend = args.cpu or jax.default_backend() == "cpu"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo,
                                   ".jax_cache" if cpu_backend
                                   else ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from .pipelines.text2video import (build_segmented_runner, generate,
                                       resolve_pipeline)
    from .utils.video_io import encode_mp4

    pipe = resolve_pipeline(args.model, seed=args.seed)
    if args.perturb:
        from .utils.testing import perturb_zero_params

        pipe.params = perturb_zero_params(pipe.params, seed=args.seed + 1)

    spec = pipe.spec
    frames = args.frames or spec.default_frames
    width = args.width or spec.default_width
    height = args.height or spec.default_height
    steps = args.steps or spec.default_steps
    gs = spec.default_guidance_scale if args.guidance_scale < 0 \
        else args.guidance_scale

    t0 = time.time()
    if args.segment_steps > 0:
        import jax.numpy as jnp

        from .ops import rng as rng_ops

        run = build_segmented_runner(
            pipe, num_frames=frames, height=height, width=width,
            num_steps=steps, guidance_scale=gs,
            segment_steps=args.segment_steps, cfg_split=args.cfg_split)
        ids = jnp.asarray(pipe.tokenize([args.negative_prompt, args.prompt]))
        fr = run(pipe.params, ids, rng_ops.base_key(args.seed))
        video = np.asarray(
            ((fr + 1.0) * 127.5).clip(0, 255)).astype(np.uint8)
    else:
        video = generate(pipe, args.prompt,
                         negative_prompt=args.negative_prompt,
                         seed=args.seed, num_frames=frames, height=height,
                         width=width, num_steps=steps, guidance_scale=gs,
                         cfg_split=args.cfg_split)
    dt = time.time() - t0
    data = encode_mp4(video, fps=args.fps)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {video.shape[0]}f@{video.shape[2]}x"
          f"{video.shape[1]}, {len(data)} bytes, {dt:.1f}s "
          f"(backend={jax.default_backend()})")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]

    if cmd == "generate":
        return _generate(rest)
    if cmd in ("miner", "validator"):
        from .network.services import main as services_main

        return services_main([cmd] + rest)
    if cmd == "mock-round":
        from .network.mock import demo

        return demo(rest)
    if cmd == "strategy":
        from .parallel.runner import main as runner_main

        return runner_main(rest)
    if cmd == "coordinator":
        from .parallel.coordinator import main as coordinator_main

        return coordinator_main(rest)
    if cmd == "convert":
        from .utils.convert import main as convert_main

        return convert_main(rest)
    if cmd == "keys":
        from .verify.cli import main as keys_main

        return keys_main(rest)
    if cmd == "econ":
        from .economics.run import main as econ_main

        return econ_main(rest)
    print(f"unknown command {cmd!r}\n")
    print(__doc__)
    return 2


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `python -m dvdx_tpu --help | head`
        sys.exit(0)
