"""Wire protocol for miner <-> validator <-> user traffic.

The reference moves tensors as base64 strings inside bittensor JSON synapses
(`/root/reference/InferNet/template/protocol.py:26-95`) — a known bottleneck
for multi-MB fp16 leaves (SURVEY.md §7 hard part e). Here every message is a
msgpack map with *raw bytes* payloads, length-prefix framed on the socket; the
schema mirrors the reference's synapse fields so capability is 1:1:

  InferenceRequest  ~ InferNet request half (prompt, geometry, seed, challenge,
                      request_id — protocol.py:26-44)
  InferenceResponse ~ InferNet response half (video bytes, merkle root,
                      signature, timesteps, proof — protocol.py:45-59,
                      miner.py:643-666)
  RevealRequest/Response ~ RevealLeavesSynapse (protocol.py:74-95) — the
                      commit-then-reveal second round trip.

Every dataclass round-trips loss-lessly: to_wire() -> bytes -> from_wire().
"""

from __future__ import annotations

import dataclasses
import hashlib
import struct
from typing import Dict, List, Optional, Tuple, Type

import msgpack

MAGIC = b"DVDX"
VERSION = 1


# --- framing ---------------------------------------------------------------


def frame(payload: bytes) -> bytes:
    """MAGIC | u8 version | u32 length | payload."""
    return MAGIC + struct.pack(">BI", VERSION, len(payload)) + payload


def unframe(buf: bytes) -> Tuple[bytes, bytes]:
    """-> (payload, rest). Raises ValueError on malformed frames."""
    if len(buf) < 9:
        raise ValueError("short frame")
    if buf[:4] != MAGIC:
        raise ValueError("bad magic")
    ver, ln = struct.unpack(">BI", buf[4:9])
    if ver != VERSION:
        raise ValueError(f"bad version {ver}")
    if len(buf) < 9 + ln:
        raise ValueError("truncated frame")
    return buf[9 : 9 + ln], buf[9 + ln :]


# --- messages --------------------------------------------------------------

_REGISTRY: Dict[str, Type] = {}


def _message(cls):
    _REGISTRY[cls.__name__] = cls
    return cls


def _asdict(obj) -> dict:
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        out[f.name] = v
    return out


def to_wire(msg) -> bytes:
    body = {"_type": type(msg).__name__, **_asdict(msg)}
    return frame(msgpack.packb(body, use_bin_type=True))


def signing_bytes(msg) -> bytes:
    """Canonical bytes a request's Ed25519 signature covers: the wire
    encoding of the message with its own `signature` field blanked. Using
    the wire encoder keeps the signed surface in lockstep with the message
    schema — new fields are covered automatically. Requests must be signed
    by the claimed validator key: the reference's synapses ride bittensor's
    signed transport, and an unsigned request lets anyone burn miner compute
    by copying a public validator key."""
    return to_wire(dataclasses.replace(msg, signature=b""))


def from_wire(data: bytes):
    payload, rest = unframe(data)
    if rest:
        raise ValueError("trailing bytes after frame")
    body = msgpack.unpackb(payload, raw=False, strict_map_key=False)
    tname = body.pop("_type", None)
    cls = _REGISTRY.get(tname)
    if cls is None:
        raise ValueError(f"unknown message type {tname!r}")
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in body.items() if k in fields}
    msg = cls(**kwargs)
    if hasattr(msg, "validate"):
        msg.validate()
    return msg


@_message
@dataclasses.dataclass
class InferenceRequest:
    request_id: str
    prompt: str
    negative_prompt: str = ""
    width: int = 576
    height: int = 320
    num_frames: int = 16
    fps: int = 8
    num_steps: int = 25
    guidance_scale: float = 7.5
    seed: int = 0                 # HMAC-derived by validator (proof.py analog)
    challenge: bytes = b""        # 32-byte validator challenge
    validator_pubkey: bytes = b""
    # step-program identity: True runs uncond/cond as two sequential UNet
    # calls (halves peak activations — required for XL geometry on one 16 GB
    # chip). Validator-chosen; prover and verifier must execute the same
    # program for bitwise re-execution, so it rides in the request.
    cfg_split: bool = False
    # signing time (unix seconds), covered by the signature: miners reject
    # requests outside a freshness window AND dedupe request_ids, so a
    # captured signed request cannot be replayed indefinitely to burn miner
    # compute (ADVICE r2 — registrations had a replay bound; requests didn't)
    issued_at: float = 0.0
    # Ed25519 over signing_bytes(self) under validator_pubkey — proves the
    # sender holds the claimed validator key (pubkeys are public via the
    # registry; without this, anyone can farm free generations)
    signature: bytes = b""

    def validate(self):
        self.cfg_split = bool(self.cfg_split)
        # the reference's pydantic validators coerce str->int (protocol.py:60-68)
        for f in ("width", "height", "num_frames", "fps", "num_steps", "seed"):
            setattr(self, f, int(getattr(self, f)))
        if self.width <= 0 or self.height <= 0 or self.num_frames <= 0:
            raise ValueError("bad geometry")
        if self.num_steps <= 0 or self.num_steps > 1000:
            raise ValueError("bad num_steps")
        if self.challenge and len(self.challenge) != 32:
            raise ValueError("challenge must be 32 bytes")


@_message
@dataclasses.dataclass
class InferenceResponse:
    request_id: str
    status: str = "ok"            # ok | error
    error: str = ""
    video: bytes = b""            # mp4 bytes
    video_sha256: bytes = b""
    merkle_root: bytes = b""
    signature: bytes = b""
    miner_pubkey: bytes = b""
    challenge: bytes = b""        # echoed
    seed: int = 0                 # echoed
    num_steps: int = 0
    timesteps: List[int] = dataclasses.field(default_factory=list)
    latent_shape: List[int] = dataclasses.field(default_factory=list)  # (F,h,w,C)
    latent_dtype: str = "bfloat16"
    # chunked-strategy miners commit their chunk plan here: the plan is
    # deterministic given (num_frames, num_chunks, preset overlap), so this
    # one int lets the validator rebuild the identical chunked step program
    # for re-execution; leaves are then (n, L, h, w, C) chunk stacks. A lie
    # changes the plan-derived shapes and fails the latent_shape cross-check.
    num_chunks: int = 0
    platform: str = ""            # backend tag: exact re-exec requires equality
    gen_time_s: float = 0.0
    # advisory miner-side phase breakdown (generate/commit/encode seconds);
    # unsigned and untrusted — used only for observability in round reports
    # (the reference logs the same phases, miner.py:514,588-610)
    timings: Dict[str, float] = dataclasses.field(default_factory=dict)


@_message
@dataclasses.dataclass
class RevealRequest:
    request_id: str
    merkle_root: bytes
    leaf_indices: List[int]
    validator_pubkey: bytes = b""
    issued_at: float = 0.0        # freshness bound (see InferenceRequest)
    signature: bytes = b""        # Ed25519 over signing_bytes(self)


@_message
@dataclasses.dataclass
class RevealResponse:
    request_id: str
    status: str = "ok"
    error: str = ""
    # per revealed leaf: (index, timestep, z_bytes, eps_bytes,
    #                     [(sibling_hash, is_right), ...])
    leaves: List[Tuple[int, int, bytes, bytes, List[Tuple[bytes, bool]]]] = (
        dataclasses.field(default_factory=list)
    )


@_message
@dataclasses.dataclass
class Ping:
    nonce: int = 0


@_message
@dataclasses.dataclass
class Pong:
    nonce: int = 0
    pubkey: bytes = b""
    busy: bool = False


def video_digest(video: bytes) -> bytes:
    return hashlib.sha256(video).digest()
