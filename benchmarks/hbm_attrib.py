"""Per-buffer attribution of a strategy's per-chip HBM reservation.

`hbm_reduction.py` reports XLA's total per-device reservation; this tool says
WHERE it goes: it parses the optimized (post-SPMD-partitioning) HLO of the
compiled strategy program, sizes every instruction's result shape, and prints
the top-N largest tensors with their op kind. Post-SPMD shapes are per-device
local shapes, so a tensor that kept its frame sharding shows F/seq on the
frame (or folded-frame) dim while a replicated one shows the full extent —
exactly the diagnostic needed to find sharding-propagation leaks (the
batch-major-fold leak fixed in ops/layout.py was found this way).

  JAX_PLATFORMS=cpu python -u benchmarks/hbm_attrib.py \
      --mode cp_exact@1x1x8 --model zeroscope-tiny-hf --top 25
"""

from __future__ import annotations

import argparse
import collections
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
                "u64": 8}

_SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*"
                       r"((?:\(?)(?:f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred|\().*?)\s+"
                       r"([\w\-]+)\(")


def shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="cp_exact@1x1x8")
    ap.add_argument("--model", default="zeroscope-tiny-hf")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--min-mb", type=float, default=0.0)
    args = ap.parse_args()

    # size the virtual CPU device pool to the requested mesh (same handling
    # as hbm_reduction.py — the flag must be final before jax imports)
    _, _, mesh_str = args.mode.partition("@")
    n_devices = (math.prod(int(x) for x in mesh_str.split("x"))
                 if mesh_str else 8)
    stripped = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                      os.environ.get("XLA_FLAGS", "")).strip()
    os.environ["XLA_FLAGS"] = (
        stripped + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import build_runner, get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline

    mode, _, mesh_str = args.mode.partition("@")
    shape = tuple(int(x) for x in mesh_str.split("x")) if mesh_str else (1, 1, 8)
    pipe = build_pipeline(args.model, seed=0)
    mesh = make_mesh(shape, devices=jax.devices()[:math.prod(shape)])
    runner = build_runner(pipe, get_strategy(mode), mesh,
                          num_frames=args.frames, height=args.height,
                          width=args.width, num_steps=args.steps)
    ids = jnp.zeros((2, pipe.spec.text.max_length), jnp.int32)
    compiled = runner.fn.lower(pipe.params, ids, rng_ops.base_key(0)).compile()
    ma = compiled.memory_analysis()
    print(f"mode={args.mode} geometry={args.frames}f@{args.width}x{args.height}"
          f" temp={ma.temp_size_in_bytes/2**20:.0f}MB"
          f" args={ma.argument_size_in_bytes/2**20:.0f}MB")

    rows = []
    by_kind = collections.Counter()
    for line in compiled.as_text().splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, type_str, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = shape_bytes(type_str)
        if b >= args.min_mb * 2**20:
            rows.append((b, op, name, type_str[:110]))
        by_kind[op] += b
    rows.sort(reverse=True)
    print(f"\ntop {args.top} largest instruction results (per-device local "
          f"shapes — replicated tensors show FULL frame extent):")
    for b, op, name, t in rows[: args.top]:
        print(f"  {b/2**20:9.1f} MB  {op:<22} {name:<28} {t}")
    print("\nbytes by op kind (top 12):")
    for op, b in by_kind.most_common(12):
        print(f"  {b/2**20:9.1f} MB  {op}")


if __name__ == "__main__":
    main()
