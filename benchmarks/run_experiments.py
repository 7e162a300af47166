"""Experiment matrix driver — the `full_experiments_ZeroscopeXL.sh` analog.

Reference (`/root/reference/Distribution/full_experiments_ZeroscopeXL.sh`):
bash loop over world size 1-6 x {wifi, ethernet} x 4 strategies under
torchrun, each appending one CSV row. Here the matrix is Python, the "world
size" axis is the mesh factorisation, and every point is one jitted program.

  python benchmarks/run_experiments.py --out results.csv --scale tiny --cpu
  python benchmarks/run_experiments.py --out results.csv --scale full   # TPU
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["fsdp", "chunk", "hybrid", "hybrid_ctx", "cp_exact", "cp_ulysses"]
EMUS = ["ethernet", "wifi"]


def mesh_for(mode: str, world: int) -> str:
    """Map (strategy, world size) to its natural mesh factorisation:
    fsdp shards only params (model axis), chunk only frames (seq axis),
    hybrids split across both."""
    if world == 1:
        return "1,1,1"
    if mode == "fsdp":
        return f"1,{world},1"
    if mode in ("chunk", "cp_exact", "cp_ulysses"):
        # pure frame/chunk sharding: the seq axis IS the strategy identity
        # (params replicate for chunk; cp presets ZeRO-shard params over the
        # model axis only when one is present)
        return f"1,1,{world}"
    model = 2 if world % 2 == 0 else 1
    return f"1,{model},{world // model}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiment_results.csv")
    ap.add_argument("--scale", default="tiny", choices=["tiny", "full"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--worlds", default="1,2,4,8")
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--emus", default=",".join(EMUS))
    args = ap.parse_args(argv)

    worlds = [int(w) for w in args.worlds.split(",")]
    modes = args.modes.split(",")
    emus = args.emus.split(",")

    if args.scale == "tiny":
        geo = ["--model", "zeroscope-tiny", "--width", "32", "--height", "32",
               "--frames", "16", "--steps", "3", "--perturb"]
    else:
        geo = ["--model", "zeroscope-v2-576w", "--width", "576", "--height",
               "320", "--frames", "16", "--steps", "25"]

    total = len(worlds) * len(modes) * len(emus)
    done = 0
    for world, mode, emu in itertools.product(worlds, modes, emus):
        mesh = mesh_for(mode, world)
        if world == 1 and mode != modes[0]:
            # all modes equal on one device; run once (mode[0]) like the
            # reference's world-size-1 baseline row
            continue
        done += 1
        cmd = [sys.executable, "-m", "dvdx_tpu.parallel.runner",
               "--mode", mode, "--mesh", mesh, "--emu", emu,
               "--csv", args.out] + geo
        if args.cpu:
            cmd += ["--cpu", "--cpu_devices", str(max(8, world))]
        print(f"[{done}/{total}] {mode} world={world} emu={emu}")
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print("  FAILED:", r.stderr.strip().splitlines()[-1] if r.stderr else "?")
        else:
            print("  ", r.stdout.strip().splitlines()[-1][:120])
    print(f"matrix complete -> {args.out}")


if __name__ == "__main__":
    main()
