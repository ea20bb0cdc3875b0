"""Debug stdout sink (reference K1: ``/root/reference/sink/stdout/driver.go``).

The reference's stdout sink optionally prints each frame (value truncated to
``value_max_bytes``, default 120), counts frames, and batches acks by size or
timer before flushing them back to the source. Here a "frame" is a row, an
"ack" is the per-epoch commit callback, and batching applies to how often the
callback fires (the runner's manifest commit is the real ack path; this sink
is for debugging pipelines interactively, e.g. ``ds.map_batches(StdoutSink())``
passthrough).
"""

from __future__ import annotations

import sys
from typing import Callable

import pyarrow as pa


class StdoutSink:
    def __init__(
        self,
        print_values: bool = True,
        value_max_bytes: int = 120,  # driver.go default
        counters: bool = True,
        ack_batch_size: int = 1,
        ack_flush_ms: int = 0,  # 0 = timer off (driver.go example default)
        on_ack: Callable[[int], None] | None = None,
        stream=None,
        clock: Callable[[], float] | None = None,
    ):
        import time

        self.print_values = print_values
        self.value_max_bytes = value_max_bytes
        self.counters = counters
        self.ack_batch_size = max(1, ack_batch_size)
        self.ack_flush_ms = ack_flush_ms
        self.on_ack = on_ack
        self.count = 0
        self._pending_acks = 0
        self.stream = stream or sys.stdout
        # injected clock (like CommitThrottle) keeps tests deterministic;
        # the reference flushes from a background timer goroutine
        # (driver.go:72-87) — here the timer is checked on write()/tick()
        self._clock = clock or time.monotonic
        self._last_flush = self._clock()

    def _flush_acks(self) -> None:
        if self.on_ack and self._pending_acks:
            self.on_ack(self._pending_acks)
            self._pending_acks = 0
        self._last_flush = self._clock()

    def tick(self) -> None:
        """Fire the ack timer if ``ack_flush_ms`` elapsed since last flush
        (reference K1 time-based flush, ``sink/stdout/driver.go:72-87``)."""
        if (
            self.ack_flush_ms > 0
            and self._pending_acks
            and (self._clock() - self._last_flush) * 1000.0 >= self.ack_flush_ms
        ):
            self._flush_acks()

    def write(self, table: pa.Table) -> int:
        """Print rows (truncated) and fire batched acks; returns rows seen."""
        for row in table.to_pylist():
            self.count += 1
            if self.print_values:
                text = str(row)
                if len(text) > self.value_max_bytes:
                    text = text[: self.value_max_bytes] + "..."
                prefix = f"[{self.count}] " if self.counters else ""
                print(f"{prefix}{text}", file=self.stream)
            self._pending_acks += 1
            if self.on_ack and self._pending_acks >= self.ack_batch_size:
                self._flush_acks()
        self.tick()
        return table.num_rows

    def close(self) -> None:
        """Flush remaining acks (driver.go flush-on-close, :106-116)."""
        if self.on_ack and self._pending_acks:
            self._flush_acks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        """map_batches passthrough form."""
        self.write(batch)
        return batch
