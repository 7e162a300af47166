"""Full PoI network round on a CONVERTED diffusers checkpoint.

Closes the loop between the two round-2 pillars: the weight converter
(utils/convert — the reference's `from_pretrained` path,
`/root/reference/InferNet/neurons/miner.py:83-123`) and the verification
network. A pipeline loaded from a diffusers-layout checkpoint directory must
drive an end-to-end mock round — real wire format, Merkle commit, bitwise
spot-step re-execution, scoring, settlement — exactly like a random-init
pipeline. This is what a miner operator actually does: point the neuron at a
downloaded checkpoint and serve.
"""

import asyncio

import pytest

from tests.test_convert import fake_checkpoint  # noqa: F401  (fixture reuse)


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.mark.usefixtures("fake_checkpoint")
def test_poi_round_on_converted_checkpoint(fake_checkpoint):  # noqa: F811
    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig
    from dvdx_tpu.utils.convert import load_diffusers_checkpoint

    pipe = load_diffusers_checkpoint(fake_checkpoint, dtype="float32")
    # the toy checkpoint's honest output is near-constant; drop the
    # degenerate-video thresholds so the round exercises the PoI path
    cfg = ValidatorConfig(sample_size=2, num_checkpoints=2, num_frames=2,
                          width=16, height=16, num_steps=3,
                          auth_min_entropy=0.0, auth_min_frame_diff=0.0)
    net = build_mock_network(n_miners=2, pipeline=pipe, validator_config=cfg)
    report = _run(net.run_request("req-ckpt", "a red panda in a tree"))

    assert len(report["miners"]) == 2
    for uid, d in report["miners"].items():
        assert d["checks"]["signature"], d
        assert d["checks"]["merkle"], d
        assert d["checks"]["base_noise"], d
        assert d["checks"]["reexecution"], d
        assert d.get("reexec_bitwise") is True, d
        # MD-VQS legitimately scores the toy model's near-constant video ~0
        # (and the ledger records nothing at score 0, so no settlement);
        # what matters here is that verification PASSED (no cheat flag)
        assert not d.get("cheat", False), d


def test_converted_checkpoint_cheater_still_caught(fake_checkpoint):  # noqa: F811
    """Verification strength is weight-independent: a lazy miner serving a
    pretrained checkpoint is slashed exactly like one on random weights."""
    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig
    from dvdx_tpu.utils.convert import load_diffusers_checkpoint

    pipe = load_diffusers_checkpoint(fake_checkpoint, dtype="float32")
    cfg = ValidatorConfig(sample_size=2, num_checkpoints=3, num_frames=2,
                          width=16, height=16, num_steps=3,
                          auth_min_entropy=0.0, auth_min_frame_diff=0.0)
    net = build_mock_network(n_miners=2, adversaries=["lazy", "honest"],
                             pipeline=pipe, validator_config=cfg)
    stake_before = net.ledger.stake_of("miner-0")
    report = _run(net.run_request("req-ckpt2", "a red panda"))
    lazy = report["miners"]["0"]
    assert lazy.get("cheat", False), lazy
    assert lazy["score"] == 0.0
    assert net.ledger.stake_of("miner-0") < stake_before
    honest = report["miners"]["1"]
    assert not honest.get("cheat", False), honest
    assert honest["checks"]["reexecution"], honest
