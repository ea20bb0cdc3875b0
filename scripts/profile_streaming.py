"""Profile the streaming runner: per-phase actor timings + total wall."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")

from quanta_ray.config import CEPConfig
from quanta_ray.engine import StreamingRunner
from quanta_ray.pipelines.flagship import default_spec
from quanta_ray.state.checkpoint import read_manifest, latest_committed_epoch
import bench

files, n_turns = bench.prepare_stream()
for f in files:
    open(f, "rb").read()

import dataclasses

out_dir = "/tmp/quanta-profile-out"
shutil.rmtree(out_dir, ignore_errors=True)
cfg = CEPConfig(num_partitions=bench.BENCH_PARTITIONS)
spec = default_spec(files, cfg)
spec = dataclasses.replace(
    spec,
    source=dataclasses.replace(spec.source, max_inflight_epochs=6),
    checkpoint_every=4,
)
t0 = time.time()
StreamingRunner(spec, out_dir).run()
wall = time.time() - t0

phase = defaultdict(float)
per_epoch = []
for e in range(latest_committed_epoch(out_dir) + 1):
    m = read_manifest(out_dir, e)
    tot = defaultdict(float)
    for pm in m["metrics"]:
        for k in ("t_ingest", "t_emit", "t_write", "t_ckpt"):
            tot[k] = max(tot[k], pm.get(k, 0))  # critical path = slowest partition
            phase[k + "_sum"] += pm.get(k, 0)
    ss = m.get("source_stats") or {}
    per_epoch.append({"epoch": e, **{k: round(v, 3) for k, v in tot.items()},
                      "t_read": ss.get("t_read_split"), "t_wait": ss.get("t_commit_wait"),
                      "live_convs": max(pm.get("live_convs", 0) for pm in m["metrics"])})

print(json.dumps({"wall": round(wall, 2), "turns_per_sec": round(n_turns / wall),
                  "ncpu": ncpu, "phase_sums": {k: round(v, 2) for k, v in phase.items()}}))
for pe in per_epoch:
    print(pe)
ray.shutdown()
