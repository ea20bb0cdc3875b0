"""Engine CLI (reference analog: ``/root/reference/cmd/engine/main.go`` —
read the pipeline spec path from env/args, init logging from env, run).

Usage:
    python -m quanta_ray run <pipeline.json|yml> <out_dir> [--follow N]
    python -m quanta_ray validate <out_dir>
    python -m quanta_ray metrics <out_dir | http://host:port/metrics>
    python -m quanta_ray control <http://host:port> [ping|pause|resume|state]
    python -m quanta_ray export <out_dir> <stream> <dest_dir>
    python -m quanta_ray bench-stream <out_dir> [n_convs] [n_epochs]
    python -m quanta_ray query list
    python -m quanta_ray query <name> [sf_dir] [--out DIR [--key COL] [--buckets N]]

``query`` runs any registered operator (``query list``; ``*`` = has a
DuckDB oracle) over an sf-style data directory. With ``--out`` the result
is written as resumable hash-partitioned parquet (per-partition ``_DONE``
markers; rerunning skips committed partitions).

``validate`` checks the exactly-once output's integrity (reference README's
"Validation results: PASS" analog): the committed manifest chain is
gap-free, every named data/checkpoint file exists, and parquet row counts
match the manifest entries. Orphan files NOT named by any manifest are
reported but are not an error — they are the expected residue of crashed
epochs and invisible to readers.

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


def validate_output(out_dir: str) -> dict:
    """Integrity-check a committed exactly-once output directory."""
    import glob

    import pyarrow.parquet as pq

    from .state.checkpoint import latest_committed_epoch, read_manifest

    errors: list[str] = []
    named: set[str] = set()
    latest = latest_committed_epoch(out_dir)
    n_rows = 0
    for e in range(latest + 1):
        m = read_manifest(out_dir, e)
        if m is None:
            errors.append(f"manifest gap at epoch {e}")
            continue
        for entry in m["files"]:
            p = os.path.join(out_dir, entry["path"])
            named.add(entry["path"])
            if not os.path.exists(p):
                errors.append(f"missing data file {entry['path']} (epoch {e})")
                continue
            rows = pq.read_metadata(p).num_rows
            if rows != entry["rows"]:
                errors.append(
                    f"{entry['path']}: {rows} rows on disk != {entry['rows']} in manifest"
                )
            n_rows += rows
        for c in m["checkpoints"]:
            named.add(c["path"])
            if not os.path.exists(os.path.join(out_dir, c["path"])):
                errors.append(f"missing checkpoint {c['path']} (epoch {e})")
    on_disk = {
        os.path.relpath(p, out_dir)
        for pat in ("data/*/*.parquet", "checkpoints/*/*.pkl")
        for p in glob.glob(os.path.join(out_dir, pat))
    }
    orphans = sorted(on_disk - named)
    return {
        "status": "PASS" if not errors else "FAIL",
        "committed_epochs": latest + 1,
        "data_rows": n_rows,
        "files_checked": len(named),
        "orphans_ignored": len(orphans),
        "errors": errors,
    }


def summarize_metrics(out_dir: str) -> dict:
    """Aggregate the per-partition operator metrics every manifest carries
    (reference C4 analog: the metrics surface is the committed manifest
    chain rather than a live HTTP endpoint — metrics survive the process
    and travel with the output)."""
    from collections import defaultdict

    from .state.checkpoint import latest_committed_epoch, read_manifest

    latest = latest_committed_epoch(out_dir)
    src = defaultdict(int)
    phases = defaultdict(float)
    emitted = defaultdict(int)
    rows_out = defaultdict(int)
    live_max = 0
    wm = None
    for e in range(latest + 1):
        m = read_manifest(out_dir, e)
        if m is None:
            continue
        ss = m.get("source_stats") or {}
        for k in ("n_input", "n_late_dropped", "n_after_chain", "n_stage_dropped"):
            src[k] += ss.get(k, 0)
        for f in m["files"]:
            rows_out[f["stream"]] += f["rows"]
        for pm in m["metrics"]:
            if "partition" not in pm:
                continue
            for k in ("t_ingest", "t_emit", "t_write", "t_ckpt"):
                phases[k] += pm.get(k, 0.0)
            for k in (
                "tumbling", "sliding", "sessions", "joins", "patterns", "count_windows",
            ):
                emitted[k] += pm.get(f"{k}_emitted", 0)
            live_max = max(live_max, pm.get("live_convs", 0))
            wm = pm.get("wm", wm)
    return {
        "committed_epochs": latest + 1,
        "source": dict(src),
        "rows_out": dict(rows_out),
        "emitted": dict(emitted),
        "phase_seconds": {k: round(v, 2) for k, v in phases.items()},
        "max_live_convs": live_max,
        "final_watermark": wm,
    }


def export_stream(out_dir: str, stream: str, dest: str) -> int:
    """Compact a committed output stream into a plain parquet dataset via
    Ray Data (read only manifest-named files → streaming write). The
    exactly-once directory stays untouched; the export is how downstream
    consumers get right-sized files without trusting anything but the
    manifests."""
    import ray.data as rd

    from .sinks.exactly_once import committed_files

    files = committed_files(out_dir, stream)
    if not files:
        return 0
    ds = rd.read_parquet(files)
    n = ds.count()
    ds.write_parquet(dest, compression="zstd")
    return n


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

    if cmd == "validate":
        out_dir = rest[0]
        result = validate_output(out_dir)
        print(json.dumps(result))
        return 0 if result["status"] == "PASS" else 1

    if cmd == "metrics":
        if rest and rest[0].startswith("http"):
            # live endpoint of a RUNNING pipeline (metrics_port spec field /
            # QUANTA_METRICS_PORT): fetch and pretty-print the snapshot
            from .telemetry import fetch_metrics

            print(json.dumps(fetch_metrics(rest[0])))
            return 0
        print(json.dumps(summarize_metrics(rest[0])))
        return 0

    if cmd == "control":
        # control <metrics-url-or-base> ping|pause|resume|state — the
        # reference Control service's Ping/PausePipeline verbs over the
        # running pipeline's HTTP endpoint (control.proto:7-9; gRPC
        # transport replaced by design, see stages/subprocess_stage.py).
        base, verb = rest[0], (rest[1] if len(rest) > 1 else "state")
        base = base.rsplit("/metrics", 1)[0]
        paths = {"ping": "/ping", "pause": "/control/pause",
                 "resume": "/control/resume", "state": "/control"}
        if verb not in paths:
            print(f"unknown control verb {verb!r}; one of: {' '.join(paths)}")
            return 2
        from .telemetry import fetch_metrics, post_control

        if verb in ("pause", "resume"):  # state-changing -> POST only
            print(json.dumps(post_control(base + paths[verb])))
        else:
            print(json.dumps(fetch_metrics(base + paths[verb])))
        return 0

    if cmd == "export":
        out_dir, stream, dest = rest[0], rest[1], rest[2]
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        try:
            n = export_stream(out_dir, stream, dest)
            print(json.dumps({"stream": stream, "rows": n, "dest": dest}))
        finally:
            ray.shutdown()
        return 0

    if cmd == "query":
        # query <name|list> [sf_dir] [--out DIR [--key COL] [--buckets N]]
        name = rest[0] if rest else "list"
        from . import registry

        qs = registry.queries()
        if name == "list":
            oracled = set(registry.oracle_sql())
            for k in sorted(qs):
                print(f"{k}{' *' if k in oracled else ''}")
            return 0
        if name not in qs:
            print(f"unknown query {name!r}; `query list` shows all")
            return 2
        sf_dir = rest[1] if len(rest) > 1 and not rest[1].startswith("--") else "/root/testdata/sf0.001"
        out = key = None
        buckets = 32
        if "--out" in rest:
            out = rest[rest.index("--out") + 1]
        if "--key" in rest:
            key = rest[rest.index("--key") + 1]
        if "--buckets" in rest:
            buckets = int(rest[rest.index("--buckets") + 1])
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        try:
            res = qs[name](sf_dir)
            import pandas as pd
            import pyarrow as pa

            t = pa.Table.from_pandas(res) if isinstance(res, pd.DataFrame) else res
            if out:
                import ray.data as rd

                from .sinks.batch_write import write_partitioned

                ds = rd.from_arrow(t)
                part_key = key or t.column_names[0]
                r = write_partitioned(ds, out, part_key, num_buckets=buckets)
                print(json.dumps({"query": name, "rows": t.num_rows, "out": out,
                                  "key": part_key, **r}))
            else:
                print(json.dumps({"query": name, "rows": t.num_rows,
                                  "columns": t.column_names}))
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
