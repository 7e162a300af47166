"""Unit tests for the spatial fold-order helpers (ops/layout.py).

The frames-major fold exists so exact-CP keeps its frame sharding through the
(F*B, H, W, C) merges (see test_parallel.test_cp_exact_shards_spatial_
activations for the compiled-memory regression); these tests pin the helper
semantics themselves: fold/unfold are inverses in both orders, and per_frame
broadcasts line up row-for-row with the fold order."""

import numpy as np

from dvdx_tpu.ops.layout import (
    fold_frames,
    frames_major,
    frames_major_active,
    per_frame,
    unfold_frames,
)


def _x(b=3, f=4):
    return np.arange(b * f * 2 * 5).reshape(b, f, 2, 5).astype(np.float32)


def test_fold_unfold_roundtrip_both_orders():
    x = _x()
    y = np.asarray(unfold_frames(fold_frames(x), 3, 4))
    np.testing.assert_array_equal(x, y)
    with frames_major():
        assert frames_major_active()
        y = np.asarray(unfold_frames(fold_frames(x), 3, 4))
        np.testing.assert_array_equal(x, y)
    assert not frames_major_active()


def test_fold_orders_differ_but_rows_are_permutation():
    x = _x()
    a = np.asarray(fold_frames(x)).reshape(12, -1)
    with frames_major():
        b = np.asarray(fold_frames(x)).reshape(12, -1)
    assert not np.array_equal(a, b)
    # batch-major row b*F+f == frames-major row f*B+b
    for bi in range(3):
        for fi in range(4):
            np.testing.assert_array_equal(a[bi * 4 + fi], b[fi * 3 + bi])


def test_param_cache_roundtrip_bitwise(tmp_path, monkeypatch):
    """DVDX_PARAM_CACHE: first build writes the flat npz, second build loads
    it; the loaded tree must be bitwise-identical (cache is part of the PoI
    weight-derivation chain) including bf16 leaves npz can't natively hold."""
    import jax

    from dvdx_tpu.pipelines.text2video import build_pipeline

    monkeypatch.setenv("DVDX_PARAM_CACHE", str(tmp_path))
    p1 = build_pipeline("zeroscope-tiny", seed=3, params_dtype="bfloat16")
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npz"
    p2 = build_pipeline("zeroscope-tiny", seed=3, params_dtype="bfloat16")
    for a, b in zip(jax.tree.leaves(p1.params), jax.tree.leaves(p2.params)):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert np.asarray(a).tobytes() == np.asarray(b).tobytes()


def test_per_frame_matches_fold_row_order():
    """Row i of per_frame(t, f) must hold the batch entry of row i of
    fold_frames(x) — the UNet relies on this to pair the folded activations
    with their time embedding / text context."""
    b, f = 3, 4
    x = _x(b, f)
    t = np.arange(b * 7).reshape(b, 7).astype(np.float32)
    for ctx in (None, frames_major):
        if ctx is None:
            folded = np.asarray(fold_frames(x))
            tp = np.asarray(per_frame(t, f))
        else:
            with ctx():
                folded = np.asarray(fold_frames(x))
                tp = np.asarray(per_frame(t, f))
        assert tp.shape == (b * f, 7)
        for row in range(b * f):
            # recover the batch index of this folded row from x's content
            bi = int(folded[row, 0, 0]) // (f * 2 * 5)
            np.testing.assert_array_equal(tp[row], t[bi])
