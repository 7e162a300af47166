"""Per-chip HBM reduction of the sharded strategies vs the unsharded baseline.

The reference's headline claim is "up to 85% peak VRAM reduction per device"
for the hybrid strategy (`/root/reference/README.md:10`), measured with pynvml
per rank (`/root/reference/Distribution/strategies/fsdp.py:39-41,248-254`).
The TPU analog: AOT-compile the SAME strategy program (parallel.strategies.
build_runner) over an n-device mesh and read XLA's per-device memory analysis
(argument + output + temp of the SPMD executable = the static per-chip
reservation). This is compile-only — no execution — so it runs on the forced
8-device CPU mesh and the numbers are the per-chip buffer sizes the same
GSPMD program would reserve per TPU chip.

Also checks the BASELINE.json north star: sharded per-chip reservation
< 15% of unsharded at the flagship geometry.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -u benchmarks/hbm_reduction.py --model zeroscope-v2-576w
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"


def per_device_bytes(compiled) -> dict:
    ma = compiled.memory_analysis()
    arg = getattr(ma, "argument_size_in_bytes", 0)
    out = getattr(ma, "output_size_in_bytes", 0)
    tmp = getattr(ma, "temp_size_in_bytes", 0)
    alias = getattr(ma, "alias_size_in_bytes", 0)
    return {"argument_mb": round(arg / 2**20, 1),
            "output_mb": round(out / 2**20, 1),
            "temp_mb": round(tmp / 2**20, 1),
            "total_mb": round((arg + out + tmp - alias) / 2**20, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="zeroscope-v2-576w")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=576)
    ap.add_argument("--steps", type=int, default=2,
                    help="memory is step-count-invariant (scan reuses "
                         "buffers); 2 keeps CPU compile time down")
    ap.add_argument("--modes",
                    default="single,fsdp,hybrid,hybrid_ctx,cp_exact@1x4x2")
    ap.add_argument("--devices", type=int, default=8,
                    help="forced host-platform device count (the virtual "
                         "chip pool meshes are carved from)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import re

    stripped = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                      os.environ.get("XLA_FLAGS", "")).strip()
    os.environ["XLA_FLAGS"] = (
        stripped + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import math

    import jax.numpy as jnp

    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import build_runner, get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline

    pipe = build_pipeline(args.model, seed=0)
    params_shape = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pipe.params)
    ids_shape = jax.ShapeDtypeStruct(
        (2, pipe.spec.text.max_length), jnp.int32)
    key = rng_ops.base_key(0)  # typed PRNG key; concrete (tiny) for lowering

    meshes = {"single": (1, 1, 1), "fsdp": (1, 8, 1), "chunk": (1, 1, 8),
              "hybrid": (1, 4, 2), "hybrid_ctx": (1, 4, 2),
              "cp_exact": (1, 4, 2)}
    report = {"model": args.model, "geometry":
              f"{args.frames}f@{args.width}x{args.height}", "modes": {}}
    base_total = None
    for spec_str in args.modes.split(","):
        # "hybrid@1x2x4" overrides the default mesh for that mode
        mode, _, mesh_str = spec_str.partition("@")
        shape = (tuple(int(x) for x in mesh_str.split("x")) if mesh_str
                 else meshes[mode])
        mesh = make_mesh(shape, devices=jax.devices()[:math.prod(shape)])
        runner = build_runner(pipe, get_strategy(mode), mesh,
                              num_frames=args.frames, height=args.height,
                              width=args.width, num_steps=args.steps)
        compiled = runner.fn.lower(params_shape, ids_shape, key).compile()
        row = per_device_bytes(compiled)
        row["mesh"] = "x".join(map(str, shape))
        if mode == "single":
            base_total = row["total_mb"]
        if base_total:
            row["per_chip_vs_unsharded_pct"] = round(
                100.0 * row["total_mb"] / base_total, 1)
            row["reduction_pct"] = round(
                100.0 * (1 - row["total_mb"] / base_total), 1)
        report["modes"][spec_str] = row
        print(json.dumps({spec_str: row}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
