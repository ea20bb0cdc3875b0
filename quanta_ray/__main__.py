"""Engine CLI (reference analog: ``/root/reference/cmd/engine/main.go`` —
read the pipeline spec path from env/args, init logging from env, run).

Usage:
    python -m quanta_ray run <pipeline.json|yml> <out_dir> [--follow N]
    python -m quanta_ray bench-stream <out_dir> [n_convs] [n_epochs]

``--follow N`` tails the source directory (reference: the consumer loops on
new records forever): new epoch files are picked up until N consecutive
empty polls, then the stream is flushed. Re-running ``run`` on an existing
out_dir resumes from the last committed manifest automatically.

The spec file is JSON (or YAML when pyyaml is installed); schema_version v1
is enforced. ``QUANTA_RAY_PIPELINE`` overrides the positional spec path.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str]) -> int:
    from .logging_setup import init_from_env

    log = init_from_env()
    if not argv:
        print(__doc__)
        return 2
    cmd, *rest = argv

    if cmd == "run":
        follow = 0
        if "--follow" in rest:
            i = rest.index("--follow")
            follow = int(rest[i + 1])
            rest = rest[:i] + rest[i + 2 :]
        spec_path = os.environ.get("QUANTA_RAY_PIPELINE", rest[0] if rest else "pipeline.json")
        out_dir = rest[1] if len(rest) > 1 else "./quanta-out"
        from .config import load_spec_file

        spec = load_spec_file(spec_path)

        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        try:
            from .engine import StreamingRunner

            summary = StreamingRunner(spec, out_dir).run(follow=follow)
            log.info("run complete: %s", summary["status"])
            print(json.dumps(summary, default=str))
        finally:
            ray.shutdown()
        return 0

    if cmd == "bench-stream":
        out_dir = rest[0] if rest else "/tmp/quanta-stream"
        n_convs = int(rest[1]) if len(rest) > 1 else 1000
        n_epochs = int(rest[2]) if len(rest) > 2 else 8
        from .fixtures import TranscriptParams, make_stream

        files = make_stream(out_dir, TranscriptParams(n_convs=n_convs, n_epochs=n_epochs))
        print(json.dumps({"files": files}))
        return 0

    print(f"unknown command {cmd!r}\n{__doc__}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
