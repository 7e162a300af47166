"""Multi-process chunk coordinator: orchestration WITHOUT a shared mesh.

The reference's legacy `DistributedCoordinator` pickles chunk tensors to disk,
launches `distributed_worker.py` subprocesses, and restitches
(`/root/reference/Distribution/legacy/Latent Chunking/
distributed_coordinator.py:21-302`). This is the cross-HOST (DCN) regime: no
jax mesh spans the workers; each worker is an independent JAX process (its own
chip/VM), and the only contract is (seed, frame range) in / latent chunk out.

TPU-native improvements over the reference runtime:
* zero input shipping — workers re-derive shared base noise from the seed
  (ops/rng counter-based keys), so coordinator->worker traffic is O(1);
* results come back as npz latent chunks; the coordinator ramp-blends
  (parallel/latent_chunking) and decodes once;
* `worker_cmd` hooks allow remote launchers (ssh/k8s) in place of local
  subprocesses.

  python -m dvdx_tpu.parallel.coordinator --prompt "lava flow" \
      --num-chunks 2 --frames 8 --model zeroscope-tiny --cpu --out video.mp4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Callable, List, Optional

import numpy as np

from .chunking import plan_chunks
from .latent_chunking import chunk_bounds, stitch_chunks


def run_coordinated(
    prompt: str,
    *,
    model: str = "zeroscope-tiny",
    num_chunks: int = 2,
    overlap: int = 2,
    num_frames: int = 8,
    width: int = 32,
    height: int = 32,
    steps: int = 3,
    seed: int = 0,
    cpu: bool = True,
    perturb: bool = False,
    workdir: Optional[str] = None,
    launcher: Optional[Callable[[List[str]], subprocess.Popen]] = None,
) -> dict:
    """Fan chunks out to worker processes, stitch, decode. Returns metrics +
    the decoded uint8 video under key 'video'."""
    plan = plan_chunks(num_frames, num_chunks, overlap)
    workdir = workdir or tempfile.mkdtemp(prefix="dvdx_coord_")
    os.makedirs(workdir, exist_ok=True)
    bounds = chunk_bounds(plan)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    launch = launcher or (lambda c: subprocess.Popen(
        c, stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=repo_root))

    def launch_worker(i: int, tag: str = ""):
        start, end = bounds[i]
        out = os.path.join(workdir, f"chunk_{i}{tag}.npz")
        cmd = [sys.executable, "-m", "dvdx_tpu.parallel.worker",
               "--model", model, "--prompt", prompt, "--seed", str(seed),
               "--start", str(start), "--length", str(end - start),
               "--width", str(width), "--height", str(height),
               "--steps", str(steps), "--out", out]
        if cpu:
            cmd.append("--cpu")
        if perturb:
            cmd.append("--perturb")
        return launch(cmd), out, i

    t0 = time.time()
    procs = [launch_worker(i) for i in range(plan.num_chunks)]

    def collect(procs):
        failures = []
        for proc, out, i in procs:
            stdout, stderr = proc.communicate(timeout=600)
            if proc.returncode != 0 or not os.path.exists(out):
                failures.append((i, (stderr or b"")[-400:].decode(errors="replace")))
                continue
            chunks[i] = np.load(out)["latent"]
        return failures

    chunks: List[Optional[np.ndarray]] = [None] * plan.num_chunks
    failures = collect(procs)
    if failures:
        # elastic recovery (absent in the reference, SURVEY.md §5): chunk
        # inputs are pure functions of (seed, range), so any failed chunk can
        # be re-derived by a fresh worker — retry once before giving up
        failures = collect([launch_worker(i, "_retry") for i, _err in failures])
        if failures:
            raise RuntimeError(f"workers failed after retry: {failures}")
    worker_s = time.time() - t0

    latent = stitch_chunks(chunks, plan)  # (F, lh, lw, C)

    # decode in-process
    import jax

    if cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/dvdx_jax"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
    import jax.numpy as jnp

    from ..pipelines.text2video import build_pipeline
    from ..models.vae import decode_frames_tiled
    from ..utils.testing import perturb_zero_params

    pipe = build_pipeline(model, seed=0)
    if perturb:
        pipe.params = perturb_zero_params(pipe.params, seed=99)
    dec = jax.jit(lambda p, z: decode_frames_tiled(pipe.vae_decoder.apply, p, z))
    frames = dec(pipe.params["vae_dec"], jnp.asarray(latent, jnp.float32))
    video = np.asarray(((frames + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8))

    return {
        "video": video,
        "num_chunks": plan.num_chunks,
        "chunk_len": plan.chunk_len,
        "worker_s": round(worker_s, 2),
        "total_s": round(time.time() - t0, 2),
        "workdir": workdir,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="dvdx multi-process coordinator")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--model", default="zeroscope-tiny")
    ap.add_argument("--num-chunks", type=int, default=2)
    ap.add_argument("--overlap", type=int, default=2)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--perturb", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    res = run_coordinated(
        args.prompt, model=args.model, num_chunks=args.num_chunks,
        overlap=args.overlap, num_frames=args.frames, width=args.width,
        height=args.height, steps=args.steps, seed=args.seed, cpu=args.cpu,
        perturb=args.perturb,
    )
    video = res.pop("video")
    if args.out:
        from ..utils.video_io import encode_mp4

        with open(args.out, "wb") as f:
            f.write(encode_mp4(video, fps=8))
        res["out"] = args.out
    res["video_shape"] = list(video.shape)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
