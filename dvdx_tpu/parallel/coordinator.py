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
    transport: str = "file",
) -> dict:
    """Fan chunks out to worker processes, stitch, decode. Returns metrics +
    the decoded uint8 video under key 'video'.

    transport='socket' streams result chunks back over REAL localhost TCP
    sockets and reports MEASURED payload bytes + transfer timings
    (measured_network_bytes / net_gather_s) — the reference measures its
    pickled all_gather the same way (`chunk_only.py:126-134,175-177`); the
    runner CLI's analytic comm model is validated against these measurements
    (tests/test_parallel_net.py). transport='file' keeps the npz-on-disk path
    (the reference's legacy coordinator behaviour)."""
    plan = plan_chunks(num_frames, num_chunks, overlap)
    workdir = workdir or tempfile.mkdtemp(prefix="dvdx_coord_")
    os.makedirs(workdir, exist_ok=True)
    bounds = chunk_bounds(plan)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    launch = launcher or (lambda c: subprocess.Popen(
        c, stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=repo_root))

    server = None
    if transport == "socket":
        import socket as _socket

        server = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        server.bind(("127.0.0.1", 0))
        server.listen(plan.num_chunks * 2)
        server.settimeout(600)
        sock_addr = f"127.0.0.1:{server.getsockname()[1]}"

    def launch_worker(i: int, tag: str = ""):
        start, end = bounds[i]
        out = os.path.join(workdir, f"chunk_{i}{tag}.npz")
        cmd = [sys.executable, "-m", "dvdx_tpu.parallel.worker",
               "--model", model, "--prompt", prompt, "--seed", str(seed),
               "--start", str(start), "--length", str(end - start),
               "--width", str(width), "--height", str(height),
               "--steps", str(steps)]
        if transport == "socket":
            cmd += ["--send-to", sock_addr]
        else:
            cmd += ["--out", out]
        if cpu:
            cmd.append("--cpu")
        if perturb:
            cmd.append("--perturb")
        return launch(cmd), out, i

    t0 = time.time()
    procs = [launch_worker(i) for i in range(plan.num_chunks)]
    start_to_idx = {bounds[i][0]: i for i in range(plan.num_chunks)}
    net = {"measured_network_bytes": 0, "net_gather_s": 0.0,
           "per_chunk_recv_s": []}

    def collect_sockets(procs):
        """Receive chunks over the listening socket; measure real payload
        bytes + per-chunk recv time + total gather wall time. Returns when
        every launched worker either delivered or exited (no hang on a dead
        worker — liveness is polled between short accept timeouts)."""
        import io
        import socket as _socket
        import struct

        def recv_one(conn):
            """One framed chunk off `conn`; raises on short/corrupt stream —
            the caller treats that as a per-chunk failure (retry path), not
            a coordinator crash."""
            r0 = time.time()
            header = b""
            while len(header) < 16:
                part = conn.recv(16 - len(header))
                if not part:
                    raise IOError("short chunk header")
                header += part
            if header[:8] != b"DVDXCHNK":
                raise IOError(f"bad chunk magic {header[:8]!r}")
            start, ln = struct.unpack(">II", header[8:16])
            payload = bytearray()
            while len(payload) < ln:
                part = conn.recv(min(1 << 20, ln - len(payload)))
                if not part:
                    raise IOError("short chunk stream")
                payload += part
            return start, ln, bytes(payload), time.time() - r0

        pending = {i for _, _, i in procs}
        server.settimeout(1.0)
        gather_t0 = None
        deadline = time.time() + 600
        draining = False  # all workers exited: one last sweep of the backlog
        while pending and time.time() < deadline:
            try:
                conn, _ = server.accept()
            except _socket.timeout:
                if draining:
                    break  # backlog empty; whatever is left failed
                if all(p.poll() is not None for p, _, _ in procs):
                    # workers are done, but a delivery may still sit in the
                    # accept backlog (connect+send+exit within our timeout
                    # window) — keep accepting until one timeout comes back
                    # empty instead of misclassifying it as a failure
                    draining = True
                continue
            try:
                with conn:
                    gather_t0 = gather_t0 or time.time()
                    start, ln, payload, recv_s = recv_one(conn)
                i = start_to_idx.get(start)
                if i is None:
                    raise IOError(f"unknown chunk start {start}")
                chunks[i] = np.load(io.BytesIO(payload))["latent"]
            except Exception as e:  # corrupt/partial delivery -> retry path
                print(f"[coordinator] discarded bad chunk delivery: {e}")
                continue
            net["measured_network_bytes"] += 16 + ln
            net["per_chunk_recv_s"].append(round(recv_s, 4))
            pending.discard(i)
        if gather_t0 is not None:
            net["net_gather_s"] = round(time.time() - gather_t0, 4)

    def collect(procs):
        failures = []
        if transport == "socket":
            collect_sockets(procs)
        for proc, out, i in procs:
            stdout, stderr = proc.communicate(timeout=600)
            delivered = chunks[i] is not None if transport == "socket" \
                else os.path.exists(out)
            if proc.returncode != 0 or not delivered:
                failures.append((i, (stderr or b"")[-400:].decode(errors="replace")))
                continue
            if transport == "file":
                chunks[i] = np.load(out)["latent"]
        return failures

    chunks: List[Optional[np.ndarray]] = [None] * plan.num_chunks
    try:
        failures = collect(procs)
        if failures:
            # elastic recovery (absent in the reference, SURVEY.md §5): chunk
            # inputs are pure functions of (seed, range), so any failed chunk
            # can be re-derived by a fresh worker — retry once before giving up
            failures = collect([launch_worker(i, "_retry") for i, _err in failures])
            if failures:
                raise RuntimeError(f"workers failed after retry: {failures}")
    finally:
        if server is not None:
            server.close()
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
        "transport": transport,
        **({k: v for k, v in net.items()} if transport == "socket" else {}),
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
    ap.add_argument("--transport", default="file", choices=["file", "socket"],
                    help="socket = real TCP return path with measured "
                         "network_bytes / net_gather_s")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    res = run_coordinated(
        args.prompt, model=args.model, num_chunks=args.num_chunks,
        overlap=args.overlap, num_frames=args.frames, width=args.width,
        height=args.height, steps=args.steps, seed=args.seed, cpu=args.cpu,
        perturb=args.perturb, transport=args.transport,
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
