"""Pretty-print strategy benchmark results (view_results.py analog).

  python benchmarks/view_results.py results.csv [--metric latency_s]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--metric", default="latency_s")
    args = ap.parse_args(argv)

    import pandas as pd

    df = pd.read_csv(args.csv)
    cols = ["mode", "world_size", "emu", "latency_s", "throughput_fps",
            "param_mb_per_device", "network_bytes", "temp_instab", "flow_err"]
    cols = [c for c in cols if c in df.columns]
    print(df[cols].to_string(index=False))
    print()
    pivot = df.pivot_table(index="mode", columns="world_size",
                           values=args.metric, aggfunc="min")
    print(f"== {args.metric} by mode x world size ==")
    print(pivot.to_string())


if __name__ == "__main__":
    main()
