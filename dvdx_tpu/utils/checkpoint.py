"""Checkpoint save/load/fetch for pipelines (orbax-backed).

Covers two reference components:
* the retry-hardened model downloader
  (`/root/reference/Distribution/download_model.py:17-94` — HF snapshot fetch
  with exponential backoff): here `fetch_checkpoint` retries any copy/remote
  errors with backoff; sources are filesystem paths or custom fetcher fns
  (zero-egress runtime — HF hub adapters plug in via `fetcher`);
* validator/miner state persistence (`template/base/validator.py:416-436`)
  is handled by network.base.ScoreBook.save/load; this module persists model
  *weights* so every network participant derives identical parameters
  (the PoI determinism chain's weight distribution step).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any, Callable, Optional

import jax


def save_params(params: Any, path: str):
    """Save a param pytree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a param pytree. `like` provides the target structure/sharding
    (abstract arrays ok); without it, restores as host numpy."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def _local_fetcher(src: str, dst: str) -> None:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)


def _hf_snapshot(repo_id: str, revision: Optional[str], dst: str) -> None:
    """One HF-hub snapshot attempt (separated so tests can monkeypatch the
    network call; the runtime here has zero egress)."""
    from huggingface_hub import snapshot_download

    snapshot_download(repo_id=repo_id, revision=revision, local_dir=dst,
                      token=os.environ.get("HF_TOKEN") or None)


def hf_fetcher(src: str) -> Callable[[str, str], None]:
    """Adapter for `hf://org/name[@revision]` sources — the analog of the
    reference's retry-hardened snapshot downloader
    (`/root/reference/Distribution/download_model.py:17-94`). The retry/
    backoff loop lives in fetch_checkpoint; this performs ONE attempt."""
    spec = src[len("hf://"):]
    repo_id, _, revision = spec.partition("@")
    if not repo_id or repo_id.count("/") != 1:
        raise ValueError(f"bad hf source {src!r}; expected hf://org/name[@rev]")

    def fetch(_src: str, dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        _hf_snapshot(repo_id, revision or None, dst)

    return fetch


def fetch_checkpoint(src: str, dst: str, *, retries: int = 5,
                     backoff_s: float = 1.0,
                     fetcher: Optional[Callable[[str, str], None]] = None) -> str:
    """Retry-hardened checkpoint fetch (the download_model.py analog).

    Sources: a local path (copytree), `hf://org/name[@revision]` (HF-hub
    snapshot via hf_fetcher), or any custom fetcher(src, dst) with the same
    one-attempt signature (GCS etc. plug in here). Every attempt failure is
    retried with exponential backoff, like the reference's downloader.
    """
    if fetcher is None:
        fetcher = hf_fetcher(src) if src.startswith("hf://") else _local_fetcher
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            fetcher(src, dst)
            return dst
        except Exception as e:  # noqa: BLE001 — retry everything, like the ref
            last_err = e
            if attempt < retries - 1:
                time.sleep(backoff_s * (2**attempt))
    raise RuntimeError(f"checkpoint fetch failed after {retries} attempts: {last_err}")


def save_pipeline(pipe, path: str):
    save_params(pipe.params, path)


def load_pipeline(model_name: str, path: str):
    """Build a pipeline skeleton and restore its weights."""
    from ..pipelines.text2video import build_pipeline

    pipe = build_pipeline(model_name, seed=0)
    pipe.params = load_params(path, like=pipe.params)
    return pipe
