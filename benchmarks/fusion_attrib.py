"""Attribute the 'fusion/elementwise' + 'copy/layout' profile buckets to
specific HLO fusions with HBM-traffic estimates.

The step profile (benchmarks/profile_step.py) shows elementwise fusions are
the largest standard-geometry bucket (25% post-posmajor) but names them only
as `fusion.944`-style trace ops. This tool joins the device trace with the
compiled module's optimized HLO: for every traced op it resolves the HLO
instruction, sums unique operand + output bytes (a lower bound on HBM
traffic, assuming perfect reuse), and prints achieved GB/s. Fusions near the
~800 GB/s v5e HBM roof are irreducible without removing the traffic itself;
fusions far below the roof are scheduling/layout candidates.

  python -u benchmarks/fusion_attrib.py --geometry std --steps 3
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(pred|[su]\d+|bf16|f16|f32|f64)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s+"
                       r"([a-z\-]+)\((.*)\)", re.DOTALL)
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_COMP_HDR_RE = re.compile(r"^%?([\w.\-]+)\s+\([^)]*\)\s+->")
_WINDOW_RE = re.compile(r"window=\{[^}]*size=([\dx]+)")


def shape_bytes(shape_text: str) -> int:
    """Sum byte sizes of every array shape in `shape_text` (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _first_dims(shape_text: str) -> list:
    """Dims of the first array shape in `shape_text`."""
    m = _SHAPE_RE.search(shape_text)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


def parse_hlo(hlo: str) -> dict:
    """name -> {'bytes': output bytes, 'op': opcode, 'operands': [names],
    'flops': conv/dot FLOP estimate, 'calls': fused-computation name or
    None}. The reserved key '__computations__' maps computation name ->
    {'ops': opcode set, 'flops': summed conv+dot FLOPs of the body}.

    FLOPs need operand shapes, which HLO prints only at each operand's own
    definition line — so convolution/dot estimates resolve in a second pass
    over the built table (conv: out_elems * window * Cin * 2 with Cin from
    the kernel operand's second-to-last dim; dot: 2 * out_elems *
    lhs_contracting dim)."""
    table = {}
    comps = {}
    owner = {}  # instruction name -> computation name (for body FLOPs)
    current = None
    pending = []  # (name, kind, aux) second-pass FLOP jobs
    for line in hlo.splitlines():
        hdr = _COMP_HDR_RE.match(line)
        if hdr and line.rstrip().endswith("{"):
            current = hdr.group(1)
            comps[current] = {"ops": set(), "flops": 0}
            continue
        if line.startswith("}"):
            current = None
        if "=" not in line or "{" in line.split("=")[0]:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_text, opcode, rest = m.groups()
        calls = _CALLS_RE.search(line)
        operand_text = rest.split(")")[0]
        operands = [o for o in _OPERAND_RE.findall(operand_text)
                    if not o[0].isdigit()]
        info = {"bytes": shape_bytes(shape_text), "op": opcode,
                "operands": operands, "flops": 0,
                "dims": _first_dims(shape_text),
                "calls": calls.group(1) if calls else None}
        table[name] = info
        if current is not None:
            comps[current]["ops"].add(opcode)
            owner[name] = current
        if opcode == "convolution":
            wm = _WINDOW_RE.search(line)
            window = 1
            if wm:
                for s in wm.group(1).split("x"):
                    window *= int(s)
            pending.append((name, "conv", window, _first_dims(shape_text)))
        elif opcode == "dot":
            cm = re.search(r"lhs_contracting_dims=\{(\d+)", line)
            pending.append((name, "dot", int(cm.group(1)) if cm else None,
                            _first_dims(shape_text)))
    for name, kind, aux, out_dims in pending:
        info = table[name]
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        flops = 0
        if kind == "conv" and info["operands"]:
            kdims = table.get(info["operands"][-1], {}).get("dims", [])
            if len(kdims) >= 2:
                flops = out_elems * aux * kdims[-2] * 2
        elif kind == "dot" and aux is not None and info["operands"]:
            ldims = table.get(info["operands"][0], {}).get("dims", [])
            if aux < len(ldims):
                flops = 2 * out_elems * ldims[aux]
        info["flops"] = flops
        comp = owner.get(name)
        if comp is not None:
            comps[comp]["flops"] += flops
    table["__computations__"] = comps
    return table


def traffic_bytes(name: str, table: dict) -> int:
    """Lower-bound HBM traffic of instruction `name`: unique operand bytes
    (reads) + output bytes (write)."""
    info = table.get(name)
    if info is None or "operands" not in info:
        return 0
    seen, reads = set(), 0
    for op in info["operands"]:
        if op in seen or op not in table:
            continue
        seen.add(op)
        reads += table[op]["bytes"]
    return reads + info["bytes"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/dvdx_attrib_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--geometry", choices=("std", "xl"), default="std")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="v5e HBM bandwidth roof for the pct-of-roof column")
    ap.add_argument("--dump", default="",
                    help="write every traced op's joined record (name, ms, "
                         "opcode, dims, flops, body ops) as JSON to this path")
    ap.add_argument("--agg", action="store_true",
                    help="aggregate ALL device ops (not just the top-N) by "
                         "(opcode class, lane width, size bucket) — the tail "
                         "attribution the top-N view can't show")
    args = ap.parse_args()

    import glob
    import gzip

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.verify.spotcheck import StepEngine

    pipe = build_pipeline("zeroscope-v2-576w", seed=0)
    engine = StepEngine(pipe)
    params = jax.device_put(pipe.params)
    ids = jnp.asarray(pipe.tokenize(["", "profile"]))
    uncond, cond = engine.encode_fn()(params, ids)
    if args.geometry == "xl":
        num_steps, cfg_split, f, lh, lw = 50, True, 24, 72, 128
    else:
        num_steps, cfg_split, f, lh, lw = 25, False, 16, 40, 72
    step, _ = engine.step_fn(num_steps, 7.5, cfg_split=cfg_split)
    z = engine.noise_fn(f, lh, lw, 4)(rng_ops.base_key(0))[None].astype(jnp.bfloat16)
    sample = (params, z, jnp.int32(0), cond, uncond)
    jax.block_until_ready(step(*sample))  # warm / populate cache

    # step_fn returns a jitted fn; lower+compile hits the persistent cache
    # (same program the warm call above just executed)
    table = parse_hlo(step.lower(*sample).compile().as_text())

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            jax.block_until_ready(step(params, z, jnp.int32(i), cond, uncond))

    paths = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and ("TPU" in e.get("args", {}).get("name", "").upper()
                        or "device" in e.get("args", {}).get("name", "").lower())}
    op_times = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if "jit" in name.lower():
            continue
        op_times[name] += e.get("dur", 0) / 1e6

    comps = table.get("__computations__", {})

    if args.dump:
        recs = []
        for name, dur in op_times.items():
            info = table.get(name, {})
            called = comps.get(info.get("calls") or "") or {}
            recs.append({
                "op": name, "hlo_op": info.get("op", "?"),
                "ms_per_step": round(dur / args.steps * 1e3, 4),
                "dims": info.get("dims", []),
                "flops": info.get("flops", 0) + called.get("flops", 0),
                "body": sorted(called.get("ops", [])),
                "operand_dims": [table[o]["dims"] for o in
                                 info.get("operands", []) if o in table],
            })
        recs.sort(key=lambda r: -r["ms_per_step"])
        with open(args.dump, "w") as fh:
            json.dump(recs, fh)
        print(f"dumped {len(recs)} op records -> {args.dump}")

    if args.agg:
        # Tail attribution: every traced device op, grouped by
        # (opcode-class, lane width C, row bucket). The UNet levels are
        # separable by C (320/640/1280[/2560 skip-concat]) and the rows
        # (= elements/C) collapse to the per-level spatial*batch products,
        # so this table says exactly where the sub-top-N ms/step live.
        groups = collections.defaultdict(lambda: [0.0, 0, 0, 0.0])
        unmatched = [0.0, 0]
        for name, dur in op_times.items():
            per_step = dur / args.steps
            info = table.get(name)
            if info is None:
                unmatched[0] += per_step
                unmatched[1] += 1
                continue
            opclass = info.get("op", "?")
            flops = info.get("flops", 0)
            called = comps.get(info.get("calls") or "")
            if called:
                flops += called["flops"]
            if opclass == "fusion":
                if called and "convolution" in called["ops"]:
                    opclass = "fusion(conv)"
                elif called and "dot" in called["ops"]:
                    opclass = "fusion(dot)"
                elif called and "reduce" in called["ops"]:
                    opclass = "fusion(reduce)"
            dims = info.get("dims", [])
            c = dims[-1] if dims else 0
            elems = 1
            for d in dims:
                elems *= d
            rows_n = elems // c if c else 0
            # bucket rows to decades so levels group cleanly
            rb = 0
            while rows_n >= 10:
                rows_n //= 10
                rb += 1
            key = (opclass, c, rb)
            g = groups[key]
            g[0] += per_step
            g[1] += 1
            g[2] = max(g[2], elems)
            g[3] += flops
        out = [{"opclass": k[0], "lane_c": k[1], "rows_1e": k[2],
                "ms_per_step": round(v[0] * 1e3, 3), "n_ops": v[1],
                "max_elems": v[2],
                "tflops": round(v[3] / v[0] / 1e12, 1) if v[0] else 0.0,
                "pct_of_mxu": round(100 * v[3] / v[0] / 1e12 / 197.0, 1)
                if v[0] else 0.0}
               for k, v in groups.items()]
        out.sort(key=lambda r: -r["ms_per_step"])
        total = sum(r["ms_per_step"] for r in out)
        print(json.dumps({
            "geometry": args.geometry, "total_ms_per_step": round(total, 1),
            "unmatched_ms": round(unmatched[0] * 1e3, 2),
            "unmatched_ops": unmatched[1],
            "groups": out[:80]}, indent=1))
        return

    rows = []
    for name, dur in op_times.most_common(args.top * 3):
        per_step = dur / args.steps
        tb = traffic_bytes(name, table)
        info = table.get(name, {})
        flops = info.get("flops", 0)
        body_ops = []
        called = comps.get(info.get("calls") or "")
        if called:
            flops += called["flops"]
            body_ops = sorted(called["ops"] & {
                "convolution", "dot", "reduce", "exponential", "transpose",
                "gather", "scatter", "iota", "rsqrt", "divide"})
        gbps = tb / per_step / 1e9 if per_step > 0 else 0.0
        tflops = flops / per_step / 1e12 if per_step > 0 else 0.0
        rows.append({
            "op": name[:60], "hlo_op": info.get("op", "?"),
            "body": ",".join(body_ops),
            "ms_per_step": round(per_step * 1e3, 3),
            "traffic_mb": round(tb / 2**20, 1),
            "gbps": round(gbps, 1),
            "pct_of_roof": round(100 * gbps / args.hbm_gbps, 1),
            "tflops": round(tflops, 1),
            "pct_of_mxu": round(100 * tflops / 197.0, 1),
        })
    rows.sort(key=lambda r: -r["ms_per_step"])
    print(json.dumps({"geometry": args.geometry,
                      "matched": sum(1 for r in rows if r["hlo_op"] != "?"),
                      "rows": rows[:args.top]}, indent=1))


if __name__ == "__main__":
    main()
