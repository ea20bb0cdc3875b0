#!/usr/bin/env python
"""Example out-of-process transformer plugin: uppercase the ``text`` column.

Speaks the engine's framed-Arrow-IPC plugin protocol over stdin/stdout
(see ``quanta_ray/stages/subprocess_stage.py``): read one record batch per
frame, write one back. This file is the whole plugin — the equivalent in Go
(``arrow/ipc``), Rust (``arrow-ipc``) or Java is the same ~30-line loop,
which is the reference's "plugin in any language" extension story
(``api/proto/v1/transformer.proto:13-18``) without its per-record RPC hop.

Run it only as a sidecar:  spec stage
    {"name": "subprocess", "options": {"cmd": ["python", ".../upper_plugin.py"],
                                       "name": "upper-sidecar"}}
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import pyarrow.compute as pc

from quanta_ray.stages.subprocess_stage import serve_plugin


def transform(batch):
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pc.utf8_upper(batch.column("text")),
    )


if __name__ == "__main__":
    serve_plugin(transform)
