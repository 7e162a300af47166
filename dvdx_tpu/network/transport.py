"""Transport abstraction: how neurons exchange protocol messages.

The untrusted miner<->validator hop must stay an explicit serialised protocol
(it crosses trust domains, not just devices — SURVEY.md §5). Two transports:

* MockTransport — in-process handler table with WAN emulation (latency /
  jitter / bandwidth / drop). This replaces BOTH the reference's MockDendrite
  (`template/mock.py:54-112`) and its inline collective sleep emulation
  (`Distribution/strategies/chunk_only.py:126-134`): network conditions are
  modelled at the transport layer, where they belong on a TPU deployment.
* HttpTransport / serve_http (http_transport.py) — aiohttp, msgpack frames —
  the axon/dendrite analog.

Both speak protocol.to_wire/from_wire so messages are serialised even in-proc
(catches schema bugs the reference's canned-response mocks cannot).
"""

from __future__ import annotations

import asyncio
import dataclasses
import random
import time
from typing import Awaitable, Callable, Dict, Optional

from . import protocol as P


@dataclasses.dataclass
class WANProfile:
    """Emulated consumer-network profile (reference presets
    `full_experiments_ZeroscopeXL.sh:23-33`)."""

    name: str = "ideal"
    bandwidth_mbps: float = 0.0   # 0 = infinite
    rtt_ms: float = 0.0
    jitter_ms: float = 0.0
    drop_rate: float = 0.0

    def delay_s(self, payload_bytes: int, rng: random.Random) -> float:
        d = 0.0
        if self.rtt_ms > 0:
            d += max(0.0, rng.gauss(self.rtt_ms, self.jitter_ms)) / 1e3
        if self.bandwidth_mbps > 0:
            d += payload_bytes * 8 / (self.bandwidth_mbps * 1e6)
        return d


WAN_PRESETS = {
    "ideal": WANProfile("ideal"),
    "wifi": WANProfile("wifi", bandwidth_mbps=500.0, rtt_ms=3.01, jitter_ms=3.53),
    "ethernet": WANProfile("ethernet", bandwidth_mbps=1000.0, rtt_ms=0.12, jitter_ms=0.06),
}


class TransportError(Exception):
    pass


class MockTransport:
    """address -> handler; messages round-trip through the real wire format."""

    def __init__(self, wan: Optional[WANProfile] = None, seed: int = 0):
        self._handlers: Dict[str, Callable] = {}
        self.wan = wan or WAN_PRESETS["ideal"]
        self._rng = random.Random(seed)
        self.stats = {"requests": 0, "bytes_sent": 0, "bytes_received": 0,
                      "emulated_delay_s": 0.0, "drops": 0}

    def serve(self, address: str, handler: Callable):
        """handler: (msg) -> msg (sync)."""
        self._handlers[address] = handler

    def remove(self, address: str):
        self._handlers.pop(address, None)

    async def request(self, address: str, msg, timeout_s: float = 300.0):
        self.stats["requests"] += 1
        handler = self._handlers.get(address)
        if handler is None:
            raise TransportError(f"no neuron serving at {address}")
        wire = P.to_wire(msg)
        self.stats["bytes_sent"] += len(wire)
        if self._rng.random() < self.wan.drop_rate:
            self.stats["drops"] += 1
            raise asyncio.TimeoutError(f"emulated drop to {address}")

        delay = self.wan.delay_s(len(wire), self._rng)

        async def _run():
            decoded = P.from_wire(wire)
            reply = await asyncio.get_event_loop().run_in_executor(
                None, handler, decoded)
            reply_wire = P.to_wire(reply)
            d2 = self.wan.delay_s(len(reply_wire), self._rng)
            self.stats["emulated_delay_s"] += delay + d2
            await asyncio.sleep(delay + d2)
            self.stats["bytes_received"] += len(reply_wire)
            return P.from_wire(reply_wire)

        return await asyncio.wait_for(_run(), timeout=timeout_s)
