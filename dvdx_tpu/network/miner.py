"""Miner neuron: generate video + Proof-of-Inference on request.

Reference: `/root/reference/InferNet/neurons/miner.py` — on an InferNet
synapse the miner seeds its RNG with the validator seed (:508-510), runs the
denoise loop recording every (z_t, eps_t, t) (:571-589), VAE-decodes and
exports mp4 (:591-618), builds the Merkle tree (:180-264), signs
challenge‖seed‖sha256(video)‖root (:266-332), and answers leaf-reveal
spot-check requests from its stored leaf data (:345-456, :813-888). Blacklist
and priority policies gate callers (:760-811).

TPU-native differences:
* generation runs as ONE jitted program (text encode + scan'd denoise with
  recording + decode) — no per-step Python;
* the reveal path serves raw little-endian bf16 bytes + Merkle paths (no
  base64 JSON);
* spot-check is a first-class RevealRequest message, not a sentinel synapse
  with seed=0 (the reference overloads the request type, miner.py:347-456).
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import hashlib
import io
import os
import re
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..pipelines.text2video import Pipeline
from ..utils.video_io import encode_mp4
from ..verify.spotcheck import StepEngine
from ..verify.merkle import MerkleCommitment
from ..verify.proof import Keypair, sign_proof
from . import protocol as P
from .base import Neuron, Registry


@dataclasses.dataclass
class MinerConfig:
    max_stored_proofs: int = 16       # in-memory LRU of reveal-able traces
    spool_dir: str = ""               # optional disk spool: traces survive LRU
                                      # eviction and process restarts (reveals
                                      # after eviction otherwise fail the
                                      # miner's audit through no fault)
    max_spooled_proofs: int = 256
    min_validator_stake: int = 0      # blacklist threshold (miner.py:760-792)
    max_frames: int = 64
    max_steps: int = 100
    # memory-dominant request dimensions must be bounded too: an uncapped
    # height/width OOMs the chip or exceeds runtime execution limits
    max_height: int = 1024
    max_width: int = 1600
    # reveal DoS bound: the validator asks for at most 2k+2 indices; a cap
    # (after dedup) stops leaf_indices=[0]*10**6 memory amplification
    max_reveal_indices: int = 64
    fps_default: int = 8
    # replay bound (ADVICE r2): signed requests carry issued_at; anything
    # outside this window is refused, and inference request_ids are deduped,
    # so a captured signed request cannot be replayed to burn compute.
    # Matches the 600 s registration replay bound in verify/proof.py.
    max_request_age_s: float = 600.0


class Miner(Neuron):
    """In-process miner logic; transports (mock or HTTP) call handle()."""

    def __init__(self, pipeline: Pipeline, keypair: Keypair, registry: Registry,
                 config: Optional[MinerConfig] = None, *,
                 mesh=None, strategy=None):
        super().__init__(keypair=keypair, registry=registry, role="miner")
        self.pipeline = pipeline
        # PoI-grade generation: the SAME jitted step program the validator
        # re-executes -> bitwise-verifiable commitments (verify/spotcheck.py).
        # With a mesh + strategy (fsdp/cp_exact) the miner generates SHARDED
        # across its chips and the trace still verifies on a single-device
        # validator in tolerance mode — the miner must then register with
        # platform=self.platform_tag so the validator knows the regime
        # (VERDICT r3 item 1: the two pillars composed).
        self.engine = StepEngine(pipeline, mesh=mesh, strategy=strategy)
        self.config = config or MinerConfig()
        # request_id -> (merkle commitment, timesteps)  [reveal store]
        self._proofs: "collections.OrderedDict[str, MerkleCommitment]" = (
            collections.OrderedDict()
        )
        self.metrics = {"requests": 0, "errors": 0, "reveals": 0,
                        "total_gen_s": 0.0}
        # replay dedupe: request_ids already generated for (bounded; within
        # the freshness window this cannot overflow in honest operation)
        self._served_ids: "collections.OrderedDict[str, bool]" = (
            collections.OrderedDict()
        )

    @property
    def platform_tag(self) -> str:
        """Registration pin + response tag: backend, or backend:strategy for
        a mesh-sharded engine (tolerance verification regime)."""
        return self.engine.platform_tag

    # -- policies (reference blacklist/priority, miner.py:760-811) --

    def blacklisted(self, validator_pubkey: bytes) -> bool:
        if not validator_pubkey:
            return True
        info = self.registry.by_pubkey(validator_pubkey)
        if info is None or info.role != "validator":
            return True
        return info.stake < self.config.min_validator_stake

    def priority(self, validator_pubkey: bytes) -> float:
        info = self.registry.by_pubkey(validator_pubkey)
        return float(info.stake) if info else 0.0

    # -- request handling --

    def handle(self, msg):
        if isinstance(msg, P.Ping):
            return P.Pong(nonce=msg.nonce, pubkey=self.pubkey)
        if isinstance(msg, P.InferenceRequest):
            return self.handle_inference(msg)
        if isinstance(msg, P.RevealRequest):
            return self.handle_reveal(msg)
        raise ValueError(f"miner cannot handle {type(msg).__name__}")

    def _caller_rejected(self, req) -> str:
        """Gate shared by inference AND reveal: the caller must present a
        valid Ed25519 signature under its claimed validator key (pubkeys are
        public via the registry — without possession proof anyone can farm
        free generations or dump committed traces), and that key must pass
        the blacklist/stake policy."""
        from ..verify.proof import verify_signature

        if not req.signature or not verify_signature(
                req.validator_pubkey, P.signing_bytes(req), req.signature):
            return "unsigned or invalid request signature"
        age = abs(time.time() - float(getattr(req, "issued_at", 0.0)))
        if age > self.config.max_request_age_s:
            return f"stale request (age {age:.0f}s > replay bound)"
        if self.blacklisted(req.validator_pubkey):
            return "blacklisted caller"
        return ""

    def handle_inference(self, req: P.InferenceRequest) -> P.InferenceResponse:
        self.metrics["requests"] += 1
        rejected = self._caller_rejected(req)
        if rejected:
            self.metrics["errors"] += 1
            return P.InferenceResponse(request_id=req.request_id, status="error",
                                       error=rejected)
        if req.request_id in self._served_ids:
            # a replayed capture of a still-fresh signed request (ADVICE r2)
            self.metrics["errors"] += 1
            return P.InferenceResponse(request_id=req.request_id, status="error",
                                       error="replayed request_id")
        self._served_ids[req.request_id] = True
        while len(self._served_ids) > 4096:
            self._served_ids.popitem(last=False)
        try:
            return self._generate_with_proof(req)
        except Exception as e:  # graceful degradation (miner.py:690-728)
            self.metrics["errors"] += 1
            return P.InferenceResponse(request_id=req.request_id, status="error",
                                       error=f"{type(e).__name__}: {e}",
                                       miner_pubkey=self.pubkey,
                                       challenge=req.challenge, seed=req.seed)

    def _generate_with_proof(self, req: P.InferenceRequest) -> P.InferenceResponse:
        cfg = self.config
        if (req.num_frames > cfg.max_frames or req.num_steps > cfg.max_steps
                or req.height > cfg.max_height or req.width > cfg.max_width):
            raise ValueError("request exceeds miner limits")

        t0 = time.time()
        # video arrives uint8 straight from the device program (the f32 ->
        # uint8 conversion runs on-device; 4x fewer bytes over the fetch)
        gen_phases: dict = {}
        video, zs, epss, timesteps = self.engine.generate_recorded(
            req.prompt, negative_prompt=req.negative_prompt, seed=req.seed,
            num_frames=req.num_frames, height=req.height, width=req.width,
            num_steps=req.num_steps, guidance_scale=req.guidance_scale,
            cfg_split=req.cfg_split, timings=gen_phases,
        )
        gen_s = time.time() - t0
        self.metrics["total_gen_s"] += gen_s

        # leaves hash the raw bf16 bytes of (z_t, eps_t) per step
        t1 = time.perf_counter()
        commitment = MerkleCommitment(timesteps, zs, epss)
        self._store_proof(req.request_id, commitment)
        commit_s = time.perf_counter() - t1

        t1 = time.perf_counter()
        mp4 = encode_mp4(video, fps=req.fps or cfg.fps_default)
        encode_s = time.perf_counter() - t1
        signature = sign_proof(self.keypair, req.challenge, req.seed, mp4,
                               commitment.root)

        return P.InferenceResponse(
            request_id=req.request_id,
            video=mp4,
            video_sha256=hashlib.sha256(mp4).digest(),
            merkle_root=commitment.root,
            signature=signature,
            miner_pubkey=self.pubkey,
            challenge=req.challenge,
            seed=req.seed,
            num_steps=req.num_steps,
            timesteps=[int(t) for t in timesteps],
            latent_shape=list(zs.shape[1:]),
            latent_dtype=str(zs.dtype),
            num_chunks=(self.engine.chunk_plan(req.num_frames).num_chunks
                        if self.engine.chunked else 0),
            platform=self.platform_tag,
            gen_time_s=gen_s,
            timings={"generate": round(gen_s, 4),
                     **{f"gen_{k}": v for k, v in gen_phases.items()},
                     "merkle_commit": round(commit_s, 4),
                     "encode_mp4": round(encode_s, 4)},
        )

    def _spool_path(self, request_id: str) -> Optional[str]:
        if not self.config.spool_dir:
            return None
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", request_id)
        return os.path.join(self.config.spool_dir, f"trace_{safe}.npz")

    def _store_proof(self, request_id: str, commitment: MerkleCommitment):
        self._proofs[request_id] = commitment
        while len(self._proofs) > self.config.max_stored_proofs:
            self._proofs.popitem(last=False)
        path = self._spool_path(request_id)
        if path:
            os.makedirs(self.config.spool_dir, exist_ok=True)
            np.savez(path, timesteps=commitment.timesteps,
                     zs=commitment.zs.view(np.uint16),
                     epss=commitment.epss.view(np.uint16),
                     dtype=str(commitment.zs.dtype))
            self._prune_spool()

    def _prune_spool(self):
        files = sorted(glob.glob(os.path.join(self.config.spool_dir, "trace_*.npz")),
                       key=os.path.getmtime)
        for f in files[: max(0, len(files) - self.config.max_spooled_proofs)]:
            os.unlink(f)

    def _load_proof(self, request_id: str) -> Optional[MerkleCommitment]:
        com = self._proofs.get(request_id)
        if com is not None:
            return com
        path = self._spool_path(request_id)
        if path and os.path.exists(path):
            import ml_dtypes

            d = np.load(path, allow_pickle=False)
            dt = np.dtype(ml_dtypes.bfloat16) if str(d["dtype"]) == "bfloat16" \
                else np.dtype(str(d["dtype"]))
            com = MerkleCommitment(d["timesteps"], d["zs"].view(dt),
                                   d["epss"].view(dt))
            self._proofs[request_id] = com  # warm the LRU
            # spool reloads must respect the in-memory cap too, or reveals
            # for up to max_spooled_proofs old requests grow the store
            # unboundedly (each commitment is ~18 MB at standard geometry)
            while len(self._proofs) > self.config.max_stored_proofs:
                self._proofs.popitem(last=False)
            return com
        return None

    def handle_reveal(self, req: P.RevealRequest) -> P.RevealResponse:
        self.metrics["reveals"] += 1
        rejected = self._caller_rejected(req)
        if rejected:
            self.metrics["errors"] += 1
            return P.RevealResponse(request_id=req.request_id, status="error",
                                    error=rejected)
        com = self._load_proof(req.request_id)
        if com is None:
            return P.RevealResponse(request_id=req.request_id, status="error",
                                    error="unknown request")
        if com.root != req.merkle_root:
            return P.RevealResponse(request_id=req.request_id, status="error",
                                    error="root mismatch")
        # dedup + cap: reveal size must be bounded by policy, not the caller
        indices = sorted({int(i) for i in req.leaf_indices})
        if len(indices) > self.config.max_reveal_indices:
            return P.RevealResponse(request_id=req.request_id, status="error",
                                    error="too many indices")
        leaves = []
        for idx in indices:
            if not 0 <= idx < len(com.leaves):
                return P.RevealResponse(request_id=req.request_id, status="error",
                                        error=f"bad index {idx}")
            t, zb, eb, path = com.open(idx)
            leaves.append((idx, t, zb, eb, [(h, bool(r)) for h, r in path]))
        return P.RevealResponse(request_id=req.request_id, leaves=leaves)
