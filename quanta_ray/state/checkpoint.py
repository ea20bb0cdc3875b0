"""Commit/checkpoint machinery.

Three pieces, each mirroring a reference flow-control component:

- ``LowWatermarkTracker`` — the contiguous-ack low-watermark tracker
  (``/root/reference/source/kafka/checkpoint.go:11-62``): items tracked in
  arrival order may resolve out of order; ``highest()`` is the newest item
  such that ALL earlier items have resolved — only the contiguous prefix is
  committable. Used by the streaming runner to decide how far the input
  offset frontier may advance when epochs/partitions complete out of order.

- ``CommitThrottle`` — commit at most once per interval
  (``checkpoint.go:108-135``; default 5s, ``config.go:80-82``). Time is
  injected (a counter or data-driven clock), never wall-clock, so semantics
  stay deterministic.

- Manifest I/O — the two-phase-commit surface of the exactly-once sink
  (reference analog: end-to-end ack → offset commit, upgraded to
  exactly-once): writers produce files under unique temp names; the single
  committer writes ``manifest-{epoch:08d}.json`` naming output files +
  checkpoint files + offsets + metrics, then atomically updates ``_LATEST``.
  A file not named by a committed manifest does not exist.
"""

from __future__ import annotations

import json
import os
from typing import Any


class LowWatermarkTracker:
    """Contiguous-prefix commit watermark over monotonically tracked seqnos."""

    def __init__(self) -> None:
        self._next_track = 0
        self._resolved: set[int] = set()
        self._frontier = -1  # highest seq with all <= it resolved

    def track(self) -> int:
        seq = self._next_track
        self._next_track += 1
        return seq

    def resolve(self, seq: int) -> None:
        if seq < 0 or seq >= self._next_track:
            raise ValueError(f"unknown seq {seq}")
        self._resolved.add(seq)
        while self._frontier + 1 in self._resolved:
            self._frontier += 1
            self._resolved.discard(self._frontier)

    def pending(self) -> int:
        return self._next_track - (self._frontier + 1) - len(self._resolved)

    def highest(self) -> int:
        """Highest committable seq (-1 = nothing committable yet)."""
        return self._frontier


class CommitThrottle:
    """At-most-once-per-interval commit gate with injected clock."""

    def __init__(self, interval: float):
        self.interval = interval
        self._last: float | None = None

    def should_commit(self, now: float) -> bool:
        if self._last is None or now - self._last >= self.interval:
            self._last = now
            return True
        return False


# --- manifest / checkpoint I/O ------------------------------------------------


def write_json_atomic(path: str, payload: dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


def manifest_path(out_dir: str, epoch: int) -> str:
    return os.path.join(out_dir, f"manifest-{epoch:08d}.json")


def write_manifest(out_dir: str, epoch: int, payload: dict[str, Any]) -> None:
    """Commit an epoch: manifest file then the _LATEST pointer (both atomic).

    Crash between the two writes leaves _LATEST at the previous epoch; the
    next run re-commits epoch's manifest idempotently (same deterministic
    file names ⇒ identical manifest), mirroring the reference's
    at-least-once redelivery made exactly-once by deterministic output
    (SURVEY §2.1 F7).
    """
    os.makedirs(out_dir, exist_ok=True)
    payload = dict(payload, epoch=epoch)
    write_json_atomic(manifest_path(out_dir, epoch), payload)
    write_json_atomic(os.path.join(out_dir, "_LATEST.json"), {"epoch": epoch})


def read_manifest(out_dir: str, epoch: int) -> dict[str, Any] | None:
    p = manifest_path(out_dir, epoch)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def latest_committed_epoch(out_dir: str) -> int:
    """-1 if nothing committed."""
    p = os.path.join(out_dir, "_LATEST.json")
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(json.load(f)["epoch"])
