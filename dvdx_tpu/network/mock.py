"""Cluster-free mock network (the `template/mock.py` analog).

`build_mock_network` assembles N in-process miners + a validator + ledger +
mock transport — multi-node behaviour without sockets or a chain (reference
MockSubtensor/MockMetagraph/MockDendrite, `template/mock.py:10-121`). Unlike
the reference's canned-response dendrite, these miners run the REAL generation
+ proof path through the REAL wire format; only the sockets are fake.

Also provides adversarial miners for testing the Proof-of-Inference layer —
the tamper models the Economics pillar analyses (m tampered steps,
`Economics/core/security_analysis.py:46-60`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..pipelines.text2video import Pipeline, build_pipeline
from ..utils.testing import perturb_zero_params
from ..verify.merkle import MerkleCommitment
from ..verify.proof import Keypair
from .base import Registry
from .ledger import Ledger
from .miner import Miner, MinerConfig
from .transport import MockTransport, WANProfile
from .validator import Validator, ValidatorConfig


class LazyMiner(Miner):
    """Adversary: commits to fabricated eps for the last `tamper_steps` steps
    (skipping UNet compute) — the cheating model of the economics sims. The
    Merkle tree and signature stay valid; only exact re-execution catches it."""

    def __init__(self, *args, tamper_steps: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.tamper_steps = tamper_steps

    def _generate_with_proof(self, req):
        resp = super()._generate_with_proof(req)
        com = self._proofs[req.request_id]
        m = min(self.tamper_steps, len(com.timesteps))
        rng = np.random.default_rng(0)
        epss = com.epss.copy()
        for i in range(len(epss) - m, len(epss)):
            epss[i] = rng.normal(0, 1, epss[i].shape).astype(epss.dtype)
        tampered = MerkleCommitment(com.timesteps, com.zs, epss)
        self._proofs[req.request_id] = tampered
        # re-sign over the tampered root so signature checks pass
        from ..verify.proof import sign_proof

        resp.merkle_root = tampered.root
        resp.signature = sign_proof(self.keypair, req.challenge, req.seed,
                                    resp.video, tampered.root)
        return resp


class WrongVideoMiner(Miner):
    """Adversary: honest trace + signature, but delivers an unrelated cached
    video (re-signed over the substitute's digest). Only the video<->trace
    binding check catches this — the reference cannot."""

    def _generate_with_proof(self, req):
        import hashlib

        resp = super()._generate_with_proof(req)
        rng = np.random.default_rng(1234)
        fake = rng.integers(0, 255, (req.num_frames, req.height, req.width, 3),
                            dtype=np.uint8)
        from ..utils.video_io import encode_mp4
        from ..verify.proof import sign_proof

        resp.video = encode_mp4(fake, fps=req.fps or 8)
        resp.video_sha256 = hashlib.sha256(resp.video).digest()
        resp.signature = sign_proof(self.keypair, req.challenge, req.seed,
                                    resp.video, resp.merkle_root)
        return resp


def _truncate_mantissa(params, keep_bits: int):
    """Mantissa-truncate every float leaf of a param tree (host-side): a
    proxy for cheap reduced-precision compute (int8/fp8 inference). bf16
    keeps `keep_bits` of its 7 mantissa bits; f32 of its 23."""
    import ml_dtypes

    def trunc(x):
        a = np.asarray(x)
        if a.dtype == ml_dtypes.bfloat16:
            mask = np.uint16((0xFFFF << max(0, 7 - keep_bits)) & 0xFFFF)
            return (a.view(np.uint16) & mask).view(a.dtype)
        if a.dtype == np.float32:
            mask = np.uint32(
                (0xFFFFFFFF << max(0, 23 - keep_bits)) & 0xFFFFFFFF)
            return (a.view(np.uint32) & mask).view(a.dtype)
        return a

    import jax

    return jax.tree.map(trunc, params)


class ApproxMiner(Miner):
    """Cheap-APPROXIMATE adversary (VERDICT r4 item 2): runs the real
    pipeline but with a mantissa-truncated UNet — the 'reduced-precision
    shortcut' miner living near the tolerance boundary that O(1)-off
    adversaries (lazy/wrong_seed) never probe. Its trace is fully
    self-consistent (Merkle, signature, seed-derived base noise, z-chain,
    video binding all pass, since video and leaves come from the same cheap
    program); ONLY a re-execution tolerance calibrated below its error gap
    catches it. tests/test_tolerance_calibration.py asserts the calibrated
    per-regime bounds do."""

    def __init__(self, pipeline, *args, keep_mantissa_bits: int = 2, **kwargs):
        cheap_params = dict(pipeline.params)
        cheap_params["unet"] = _truncate_mantissa(pipeline.params["unet"],
                                                  keep_mantissa_bits)
        cheap = dataclasses.replace(pipeline, params=cheap_params,
                                    _gen_cache={})
        super().__init__(cheap, *args, **kwargs)


class WrongSeedMiner(Miner):
    """Adversary: ignores the validator seed (e.g. replays a cached video)."""

    def _generate_with_proof(self, req):
        import dataclasses as dc

        bad_req = dc.replace(req, seed=(req.seed + 1) & 0xFFFFFFFFFFFFFFFF)
        resp = super()._generate_with_proof(bad_req)
        resp.seed = req.seed  # echo the expected seed to try to pass
        from ..verify.proof import sign_proof

        resp.signature = sign_proof(self.keypair, req.challenge, req.seed,
                                    resp.video, resp.merkle_root)
        return resp


@dataclasses.dataclass
class MockNetwork:
    registry: Registry
    ledger: Ledger
    transport: MockTransport
    validator: Validator
    miners: List[Miner]

    async def run_request(self, request_id: str, prompt: str, user: str = "user",
                          deposit: int = 20000):
        """Full lifecycle: deposit+commit -> round -> rewards."""
        from .ledger import prompt_commitment

        self.ledger.mint(user, deposit)
        self.ledger.deposit_and_commit(user, request_id,
                                       prompt_commitment(prompt), deposit)
        assert self.ledger.verify_prompt(request_id, prompt)
        report = await self.validator.run_round(request_id, prompt)
        return report


def build_mock_network(
    n_miners: int = 3,
    adversaries: Optional[List[str]] = None,   # entries: "lazy" | "wrong_seed"
    pipeline: Optional[Pipeline] = None,
    wan: Optional[WANProfile] = None,
    validator_config: Optional[ValidatorConfig] = None,
    stake: int = 10_000,
    seed: int = 0,
    mesh=None,                                 # miners generate SHARDED over
    mesh_strategy: str = "fsdp",               # this mesh (fsdp | cp_exact)
) -> MockNetwork:
    adversaries = adversaries or []
    if pipeline is None:
        pipeline = build_pipeline("zeroscope-tiny", seed=seed)
        pipeline.params = perturb_zero_params(pipeline.params, seed=99)

    registry = Registry()
    ledger = Ledger()
    transport = MockTransport(wan=wan, seed=seed)

    miners: List[Miner] = []
    for i in range(n_miners):
        kp = Keypair.from_seed(f"miner-{i}".encode())
        kind = adversaries[i] if i < len(adversaries) else "honest"
        cls = {"honest": Miner, "lazy": LazyMiner,
               "wrong_seed": WrongSeedMiner,
               "wrong_video": WrongVideoMiner,
               "approx": ApproxMiner}[kind]
        miner = cls(pipeline, kp, registry, mesh=mesh, strategy=mesh_strategy)
        addr = f"mock://miner-{i}"
        # the pin IS the verification regime: backend alone -> bitwise,
        # backend:strategy (mesh miner) -> tolerance (validator.py)
        uid = miner.register(addr, stake=stake, platform=miner.platform_tag)
        ledger.mint(f"miner-{uid}", stake)
        ledger.stake(f"miner-{uid}", stake)
        transport.serve(addr, miner.handle)
        miners.append(miner)

    vkp = Keypair.from_seed(b"validator-0")
    vcfg = validator_config or ValidatorConfig()
    validator = Validator(pipeline, vkp, registry, transport, ledger, vcfg)
    validator.register("mock://validator", stake=stake * 10)

    return MockNetwork(registry=registry, ledger=ledger, transport=transport,
                       validator=validator, miners=miners)


def demo(argv=None):
    """One-command full-network demo:
      python -m dvdx_tpu.network.mock [--miners 3] [--adversaries lazy,wrong_video]
    Runs deposit -> generation -> verification -> rewards in-process and
    prints the round report summary."""
    import argparse
    import asyncio
    import json

    ap = argparse.ArgumentParser(description="dvdx mock network demo")
    ap.add_argument("--miners", type=int, default=3)
    ap.add_argument("--adversaries", default="",
                    help="comma list: lazy | wrong_seed | wrong_video | approx")
    ap.add_argument("--prompt", default="a red panda climbing a snowy tree")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .validator import ValidatorConfig

    adv = [a for a in args.adversaries.split(",") if a]
    cfg = ValidatorConfig(sample_size=args.miners, num_checkpoints=args.steps,
                          num_frames=2, width=32, height=32,
                          num_steps=args.steps)
    net = build_mock_network(n_miners=args.miners, adversaries=adv,
                             validator_config=cfg)
    report = asyncio.new_event_loop().run_until_complete(
        net.run_request("demo", args.prompt))
    out = {
        "prompt": args.prompt,
        "miners": {
            uid: {"score": round(d["score"], 3),
                  "cheat": d.get("cheat", False),
                  "failed_check": d.get("failed_check"),
                  "bitwise": d.get("reexec_bitwise")}
            for uid, d in report["miners"].items()
        },
        "ledger": net.ledger.snapshot()["requests"]["demo"]["status"],
        "stakes": dict(net.ledger.stakes),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    demo()
