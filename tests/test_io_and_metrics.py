"""Video IO round-trips, plot helpers, and runner comm-volume estimates."""

import os

import numpy as np
import pytest

from dvdx_tpu.utils.video_io import RAW_MAGIC, decode_video, encode_mp4, encode_raw


def _vid(frames=4, size=32):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (frames, size, size, 3), dtype=np.uint8)


def test_raw_container_roundtrip():
    v = _vid()
    data = encode_raw(v, fps=8)
    assert data[:8] == RAW_MAGIC
    back = decode_video(data)
    np.testing.assert_array_equal(v, back)


def test_mp4_roundtrip_shape():
    v = _vid()
    data = encode_mp4(v, fps=8)
    back = decode_video(data)
    assert back.shape == v.shape
    # lossy codec: content must still be correlated with the source
    err = np.abs(back.astype(np.float32) - v.astype(np.float32)).mean()
    assert err < 64.0


def test_plot_helpers(tmp_path):
    import csv

    from dvdx_tpu.parallel.runner import CSV_COLUMNS
    from dvdx_tpu.utils.plots import plot_all, plot_fsdp_vs_hybrid

    path = tmp_path / "results.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
        w.writeheader()
        for mode, world, lat in [("fsdp", 2, 3.0), ("fsdp", 4, 2.0),
                                 ("hybrid", 2, 2.5), ("hybrid", 4, 1.5)]:
            row = {c: 0 for c in CSV_COLUMNS}
            row.update(timestamp="t", mode=mode, world_size=world, mesh="m",
                       model="tiny", emu="ideal", latency_s=lat,
                       throughput_fps=1 / lat, batch=1)
            w.writerow(row)
    out = plot_all(str(path), str(tmp_path / "plots"))
    assert out and all(os.path.exists(p) for p in out)
    cmp_path = plot_fsdp_vs_hybrid(str(path), str(tmp_path / "cmp.png"))
    assert os.path.exists(cmp_path)


def test_comm_estimate_scaling():
    from dvdx_tpu.parallel.chunking import plan_chunks
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.runner import estimate_comm_bytes
    from dvdx_tpu.parallel.strategies import get_strategy

    mesh = make_mesh((1, 2, 4))
    plan = plan_chunks(16, 4, 2)
    pb, steps, lat = 10_000_000, 25, 100_000

    none = estimate_comm_bytes(get_strategy("single"), mesh, None, pb, steps, lat)
    assert none["total"] == 0

    fsdp = estimate_comm_bytes(get_strategy("fsdp"), mesh, None, pb, steps, lat)
    # ZeRO-3: (model-1)/model of params per step
    assert fsdp["gather"] == int(pb * 1 / 2) * steps

    chunk = estimate_comm_bytes(get_strategy("chunk"), mesh, plan, pb, steps, lat)
    assert 0 < chunk["total"] < fsdp["total"]

    ctx = estimate_comm_bytes(get_strategy("hybrid_ctx"), mesh, plan, pb, steps, lat)
    assert ctx["reduce"] > 0  # CCI all-reduce accounted
    assert ctx["total"] > fsdp["total"]  # params + chunks + ctx


def test_runner_wan_delay_matches_transport_model():
    import random

    from dvdx_tpu.network.transport import WANProfile
    from dvdx_tpu.parallel.runner import wan_delay_s

    a = wan_delay_s(10**6, 500.0, 3.0, 0.0, random.Random(1))
    b = WANProfile("x", 500.0, 3.0, 0.0).delay_s(10**6, random.Random(1))
    assert a == b
