"""Ring vs Ulysses context parallelism A/B at video-diffusion frame counts.

Backs the in-code claim that head all-to-all is the cheaper collective
pattern at short frame axes (16-24 frames, `ops/ring_attention.py:88-98`)
with measurement instead of assertion (VERDICT r4 item 3). For each
(frames, algo) cell on the virtual CPU mesh this records:

  * end-to-end strategy latency (min-of-reps wall of the full jitted
    denoise program — CPU wall is a weak proxy for ICI scheduling, which
    is why the collective STRUCTURE columns below matter more here);
  * collective op counts from the compiled HLO (collective-permute = ring
    hops, all-to-all = ulysses reshards) — the program structure that
    determines ICI cost on real hardware;
  * analytic per-device collective bytes for the temporal-attention
    tensors: ring moves K+V around the whole ring ((n-1)/n of S twice);
    ulysses moves q,k,v there and o back ((n-1)/n of S four times) BUT in
    2 latency-bound phases instead of n-1 dependent hops.

Run: python benchmarks/cp_collectives_ab.py [--frames 16,24] [--out CSV]
Committed result: benchmarks/data/cp_ring_vs_ulysses.csv
"""

import argparse
import csv
import os
import re
import sys
import time

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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

COLUMNS = ["frames", "algo", "mesh", "latency_s", "hlo_collective_permute",
           "hlo_all_to_all", "analytic_bytes_per_dev", "max_abs_vs_single"]


def analytic_bytes(algo: str, n: int, frames: int, spatial: int, heads: int,
                   head_dim: int, itemsize: int = 4) -> int:
    """Per-device collective traffic of ONE temporal attention with the
    frame axis n-way sharded. B = folded spatial positions."""
    s_local = frames // n
    blk = spatial * s_local * heads * head_dim * itemsize
    if algo == "ring":
        # K and V each traverse n-1 hops; each device sends its local block
        # every hop
        return 2 * (n - 1) * blk
    # ulysses: q,k,v out + o back, each moving (n-1)/n of the local block
    return 4 * blk * (n - 1) // n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default="16,24")
    ap.add_argument("--mesh", default="1,1,4")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "cp_ring_vs_ulysses.csv"))
    args = ap.parse_args()

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import build_runner, get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    mesh_shape = tuple(int(x) for x in args.mesh.split(","))
    n = int(np.prod(mesh_shape))
    pipe = build_pipeline("zeroscope-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    H = W = 32
    ids = jnp.asarray(tokenize_batch(["", "cp a/b"],
                                     pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(0)

    rows = []
    for frames in [int(f) for f in args.frames.split(",")]:
        single = build_runner(
            pipe, get_strategy("single"),
            make_mesh((1, 1, 1), devices=[jax.devices()[0]]),
            num_frames=frames, height=H, width=W, num_steps=args.steps)
        ref = np.asarray(single(pipe.params, ids, key), np.float32)
        for algo, preset in (("ring", "cp_exact"), ("ulysses", "cp_ulysses")):
            mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
            runner = build_runner(
                pipe, get_strategy(preset, shard_params=False), mesh,
                num_frames=frames, height=H, width=W, num_steps=args.steps)
            lowered = runner.fn.lower(pipe.params, ids, key).compile()
            hlo = lowered.as_text()
            cp_ops = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
            a2a_ops = len(re.findall(r"all-to-all(?:-start)?\(", hlo))
            out = runner(pipe.params, ids, key)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = runner(pipe.params, ids, key)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            # analytic bytes at the deepest level (64ch -> 4 heads, the
            # level ulysses actually takes under 'auto' on this mesh)
            ab = analytic_bytes(algo, n, frames, (H // 16) * (W // 16),
                                4, 16)
            rows.append({"frames": frames, "algo": algo, "mesh": args.mesh,
                         "latency_s": round(best, 4),
                         "hlo_collective_permute": cp_ops,
                         "hlo_all_to_all": a2a_ops,
                         "analytic_bytes_per_dev": ab,
                         "max_abs_vs_single": f"{err:.2e}"})
            print(rows[-1])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=COLUMNS)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
