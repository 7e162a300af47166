"""Boundary-coherence sweep across strategies at the flagship frame geometry.

Reproduces (and beats) the reference's headline boundary measurement
(`/root/reference/Distribution/strategies/chunk_only.py:183-208`): at every
chunk boundary, the frame-pair L1 ("temp_instab") and the flow-compensated
residual ("flow_err"). The reference can only report these for its chunked
strategies; here every strategy — including the exact-CP ones that HAVE no
boundaries — is scored at the SAME frame positions (the chunk plan's
boundaries), so the columns are directly comparable:

  * interior_instab — mean consecutive-frame L1 away from boundaries: the
    video's natural motion level, the floor every strategy is judged against;
  * temp_instab / flow_err — at the plan's boundary pairs;
  * boundary_excess — temp_instab minus interior_instab: the stitching
    artifact itself. chunk_hard (overlap 0) bounds the worst case; the
    partition-of-unity blend (chunk/hybrid, overlap 2) removes the PIXEL
    seam, so the chunked-attention cost also shows up as ELEVATED
    interior_instab vs single — restricted attention degrades coherence
    globally, not just at boundaries. cp_exact ~ single by construction
    (exact global attention has no seams — the TPU-native upgrade).

Geometry: flagship frame axis (16 frames, chunk plan n=4/overlap 2
— the plan the 8-chip standard deployment uses), 10 steps, tiny
UNet on the virtual CPU mesh. Model/spatial scale changes the absolute
numbers, not the ordering; the full-scale numbers on real hardware come
from `parallel.runner --csv` which logs the same columns per run.

Parameter point: perturbed-zero params have O(0.02) temporal coupling AND an
O(0.02) output conv, so eps is negligible against the base noise — the
"video" is near-independent per-frame noise, interior L1 is pinned at its
0.25 maximum, and seams are invisible (measured: excess ~ -2e-4). Trained
video models are temporally coherent BECAUSE their temporal mixers and
output head dominate; `--temporal_gain` + `--out_gain`
(utils.testing.amplify_temporal_params / amplify_output_params) move the
random point toward that regime — same program, strong frame coupling —
so the boundary metrics measure what they measure on real checkpoints. A
`chunk_hard` cell (overlap 0, no blend) bounds the worst case.

Calibration (16f@64x48, 10 steps, seed 0; gt=temporal, go=output gain):

    gt=1..25 go=1    interior pinned at 0.250-0.248, all excesses |.|<1e-3
    gt=25 go=10      single int 0.1699 exc +0.0017 | chunk_hard exc +0.0109
    gt=60 go=25      single int 0.1340 exc +0.0037 | chunk_hard exc +0.0185
    gt=60 go=100     single int 0.1559 exc +0.0019 | chunk_hard exc +0.0187

gt=60/go=25 (defaults) = most coherent interior, strongest seam contrast.

Run: python benchmarks/boundary_sweep.py [--out CSV] [--plot PNG]
Committed: benchmarks/data/boundary_coherence.csv + .png
"""

import argparse
import csv
import os
import sys

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

COLUMNS = ["mode", "mesh", "frames", "steps", "num_chunks", "overlap",
           "context_weight", "interior_instab", "temp_instab", "flow_err",
           "boundary_excess"]


def interior_pairs(num_frames, boundary):
    bset = set(boundary)
    return [(i, i + 1) for i in range(num_frames - 1)
            if (i, i + 1) not in bset]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--width", type=int, default=64,
                    help="spatial size is scaled down for the 1-core CPU-mesh "
                         "host; the frame/plan geometry is the flagship one "
                         "and the columns match parallel.runner's full-scale "
                         "CSV")
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--num_chunks", type=int, default=4)
    ap.add_argument("--temporal_gain", type=float, default=60.0,
                    help="scale on the zero-init temporal-mixer outputs; "
                         "moves the random parameter point into the "
                         "frame-coherent regime trained checkpoints occupy "
                         "(see module docstring)")
    ap.add_argument("--out_gain", type=float, default=25.0,
                    help="scale on the zero-init UNet output conv (makes "
                         "the frame-coupled eps dominate the base noise)")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "boundary_coherence.csv"))
    ap.add_argument("--plot", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "boundary_coherence.png"))
    args = ap.parse_args()

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.parallel.chunking import plan_chunks
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import build_runner, get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.scoring.temporal import (boundary_pairs, flow_warp_error,
                                           temporal_instability)
    from dvdx_tpu.utils.testing import (amplify_output_params,
                                        amplify_temporal_params,
                                        perturb_zero_params)

    pipe = build_pipeline("zeroscope-tiny", seed=0)
    pipe.params = amplify_output_params(amplify_temporal_params(
        perturb_zero_params(pipe.params, seed=99), args.temporal_gain),
        args.out_gain)
    ids = jnp.asarray(tokenize_batch(["", "a drone shot over a coastline"],
                                     pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    seeds = [int(s) for s in args.seeds.split(",")]

    # ONE reference plan defines the scored frame positions for EVERY mode
    plan = plan_chunks(args.frames, args.num_chunks, overlap=2)
    idx = plan.frame_index
    bounds = [(int(r[0]), int(r[-1]) + 1) for r in idx]
    bpairs = boundary_pairs(bounds)
    ipairs = interior_pairs(args.frames, bpairs)

    cells = [
        ("single", "single", (1, 1, 1), {}),
        ("chunk_hard", "chunk", (1, 1, 4),
         {"num_chunks": args.num_chunks, "overlap": 0}),
        ("chunk", "chunk", (1, 1, 4), {"num_chunks": args.num_chunks}),
        ("hybrid", "hybrid", (1, 2, 4), {"num_chunks": args.num_chunks}),
        ("hybrid_ctx", "hybrid_ctx", (1, 2, 4),
         {"num_chunks": args.num_chunks}),
        ("cp_exact", "cp_exact", (1, 1, 4), {}),
    ]
    rows = []
    for label, mode, mesh_shape, over in cells:
        strat = get_strategy(mode, **over)
        n = int(np.prod(mesh_shape))
        mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
        runner = build_runner(pipe, strat, mesh, num_frames=args.frames,
                              height=args.height, width=args.width,
                              num_steps=args.steps)
        ti, fe, ii = [], [], []
        for seed in seeds:
            frames = runner(pipe.params, ids, rng_ops.base_key(seed))
            video = np.asarray(((frames + 1.0) * 127.5).clip(0, 255)
                               .astype(jnp.uint8))
            ti.append(temporal_instability(video, bpairs))
            fe.append(flow_warp_error(video, bpairs))
            ii.append(temporal_instability(video, ipairs))
        row = {"mode": label, "mesh": ",".join(map(str, mesh_shape)),
               "frames": args.frames, "steps": args.steps,
               "num_chunks": plan.num_chunks if strat.chunked else 0,
               "overlap": strat.overlap if strat.chunked else 0,
               "context_weight": strat.context_weight,
               "interior_instab": round(float(np.mean(ii)), 5),
               "temp_instab": round(float(np.mean(ti)), 5),
               "flow_err": round(float(np.mean(fe)), 5),
               "boundary_excess": round(float(np.mean(ti) - np.mean(ii)), 5)}
        rows.append(row)
        print(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=COLUMNS)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        modes = [r["mode"] for r in rows]
        x = np.arange(len(modes))
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.bar(x - 0.2, [r["temp_instab"] for r in rows], 0.4,
               label="boundary instability (L1)")
        ax.bar(x + 0.2, [r["interior_instab"] for r in rows], 0.4,
               label="interior baseline")
        ax.set_xticks(x, modes)
        ax.set_ylabel("mean frame-pair L1 ([0,1] pixels)")
        ax.set_title(f"Chunk-boundary coherence, {args.frames}f/"
                     f"{args.steps} steps, plan n={plan.num_chunks} ov=2")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
