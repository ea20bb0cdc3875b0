"""Flow-control/commit machinery tests (reference F2/F4 semantics,
``/root/reference/source/kafka/checkpoint.go``)."""

import os

from quanta_ray.state import (
    CommitThrottle,
    LowWatermarkTracker,
    latest_committed_epoch,
    read_manifest,
    write_manifest,
)


def test_contiguous_prefix_commit():
    # checkpoint.go:11-62 — out-of-order resolution commits only the prefix
    t = LowWatermarkTracker()
    seqs = [t.track() for _ in range(5)]
    assert t.highest() == -1
    t.resolve(seqs[2])
    assert t.highest() == -1  # 0 and 1 still pending
    t.resolve(seqs[0])
    assert t.highest() == 0
    t.resolve(seqs[1])
    assert t.highest() == 2  # merged forward through resolved 2
    t.resolve(seqs[4])
    assert t.highest() == 2
    t.resolve(seqs[3])
    assert t.highest() == 4
    assert t.pending() == 0


def test_commit_throttle():
    # checkpoint.go:108-135 — at most one commit per interval (injected clock)
    th = CommitThrottle(5.0)
    assert th.should_commit(0.0)
    assert not th.should_commit(3.0)
    assert th.should_commit(5.0)
    assert not th.should_commit(9.9)
    assert th.should_commit(10.0)


def test_manifest_atomicity_and_latest(tmp_path):
    d = str(tmp_path)
    assert latest_committed_epoch(d) == -1
    write_manifest(d, 0, {"files": [], "checkpoints": []})
    write_manifest(d, 1, {"files": [{"stream": "turns", "path": "x"}], "checkpoints": []})
    assert latest_committed_epoch(d) == 1
    m = read_manifest(d, 1)
    assert m["epoch"] == 1 and m["files"][0]["stream"] == "turns"
    # no stray temp files after atomic writes
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
