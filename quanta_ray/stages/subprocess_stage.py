"""Out-of-process transformer stage: the polyglot plugin boundary.

The reference's extension story is "write a transformer plugin in any
language" behind a gRPC service the compiler dials
(``/root/reference/api/proto/v1/transformer.proto:13-18``,
``internal/pipeline/compiler.go:56-63``) — but its transport is one RPC per
RECORD per stage (``internal/pipeline/runner.go:142``), which is also its
main performance bug. This module keeps the polyglot boundary and fixes the
transport: a plugin is any executable speaking **length-prefixed Arrow IPC
over stdin/stdout**, one round-trip per BATCH.

Wire protocol (both directions identical):

    [8-byte little-endian unsigned length][Arrow IPC stream bytes]

Each request frame carries one record batch; the plugin replies with exactly
one response frame carrying 0..N rows (fan-out/drop native, schema may
differ, optional ``_status`` column honoured by the usual per-row
OK/DROP/RETRY/ERROR split in ``RetryingStage``). A plugin signals a
transient failure by writing a frame whose table has a single ``_error``
string column; a dead/EOF'd plugin process is killed and respawned on the
retry path. Any language with an Arrow library (Go, Rust, Java, C++, Python,
R...) can implement this in ~30 lines — see
``examples/plugins/upper_plugin.py``.

The plugin process is spawned lazily ONCE per stage instance — i.e. once per
Ray task/actor that hosts the chain, never per batch — so at scale each map
slot owns one long-lived plugin sidecar, exactly the actor-pool shape the
rest of the engine uses for stateful work.
"""

from __future__ import annotations

import io
import struct
import subprocess
from typing import Sequence

import pyarrow as pa

from .base import TransientError, Transformer

_LEN = struct.Struct("<Q")


def write_frame(stream, table: pa.Table) -> None:
    """Serialize ``table`` as one framed Arrow IPC stream message."""
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    buf = sink.getvalue()
    stream.write(_LEN.pack(len(buf)))
    stream.write(buf)
    stream.flush()


def read_frame(stream) -> pa.Table | None:
    """Read one framed message; None on clean EOF."""
    header = stream.read(_LEN.size)
    if not header:
        return None
    if len(header) != _LEN.size:
        raise EOFError("truncated frame header")
    (n,) = _LEN.unpack(header)
    body = stream.read(n)
    if len(body) != n:
        raise EOFError(f"truncated frame body ({len(body)}/{n} bytes)")
    with pa.ipc.open_stream(pa.BufferReader(body)) as r:
        return r.read_all()


def serve_plugin(transform, stdin=None, stdout=None) -> None:
    """Run a plugin's serve loop: ``transform(pa.Table) -> pa.Table`` per
    frame until EOF. Python plugins call this; other languages implement the
    same ~30-line loop with their Arrow IPC bindings. Exceptions become
    ``_error`` frames (transient on the engine side), not crashes."""
    import sys

    stdin = stdin or sys.stdin.buffer
    stdout = stdout or sys.stdout.buffer
    while True:
        batch = read_frame(stdin)
        if batch is None:
            return
        try:
            out = transform(batch)
        except Exception as exc:  # noqa: BLE001 — shipped back as transient
            out = pa.table({"_error": [f"{type(exc).__name__}: {exc}"]})
        write_frame(stdout, out)


class SubprocessTransformer(Transformer):
    """Stage that delegates each batch to a sidecar process.

    ``cmd`` is the plugin argv (e.g. ``["python", "my_plugin.py"]`` or a
    compiled binary). The process starts on first use and is reused for
    every subsequent batch; protocol errors and plugin death raise
    ``TransientError`` so the standard retry-then-drop+ack policy (T3)
    applies, with a fresh process per retry attempt.
    """

    name = "subprocess"

    def __init__(self, cmd: Sequence[str], name: str | None = None):
        if not cmd:
            raise ValueError("subprocess stage needs a non-empty cmd")
        self.cmd = list(cmd)
        if name:
            self.name = name
        self._proc: subprocess.Popen | None = None

    # -- lifecycle -----------------------------------------------------
    def _ensure_proc(self) -> subprocess.Popen:
        if self._proc is None or self._proc.poll() is not None:
            self._proc = subprocess.Popen(
                self.cmd,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                # stderr inherited → plugin logs land in the worker log
            )
        return self._proc

    def _kill(self) -> None:
        if self._proc is not None:
            try:
                self._proc.kill()
                self._proc.wait(timeout=5)
            except Exception:
                pass
            self._proc = None

    def close(self) -> None:
        """Graceful shutdown: EOF the plugin's stdin and reap it."""
        if self._proc is not None and self._proc.poll() is None:
            try:
                self._proc.stdin.close()
                self._proc.wait(timeout=5)
            except Exception:
                self._kill()
        self._proc = None

    def __del__(self) -> None:  # pragma: no cover - GC-order dependent
        try:
            self.close()
        except Exception:
            pass

    # pickling across Ray task/actor boundaries: ship argv, not the pipe
    def __getstate__(self) -> dict:
        return {"cmd": self.cmd, "name": self.name}

    def __setstate__(self, state: dict) -> None:
        self.cmd = state["cmd"]
        self.name = state["name"]
        self._proc = None

    # -- the stage contract --------------------------------------------
    def transform_batch(self, batch: pa.Table) -> pa.Table:
        proc = self._ensure_proc()
        try:
            write_frame(proc.stdin, batch)
            out = read_frame(proc.stdout)
        except (BrokenPipeError, EOFError, OSError) as exc:
            self._kill()
            raise TransientError(f"plugin {self.cmd[0]} died mid-call: {exc}") from exc
        if out is None:
            self._kill()
            raise TransientError(f"plugin {self.cmd[0]} closed its stream")
        if out.column_names == ["_error"]:
            msg = out.column("_error")[0].as_py() if out.num_rows else "unknown"
            raise TransientError(f"plugin {self.cmd[0]}: {msg}")
        return out

    def apply_row(self, row: dict) -> list[dict] | None:
        out = self.transform_batch(pa.Table.from_pylist([row]))
        return out.to_pylist() or None
