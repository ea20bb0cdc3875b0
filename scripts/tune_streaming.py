"""Back-to-back config sweep for the streaming runner (one Ray session).

Within-process sequential runs sample similar host conditions, so config
deltas are comparable despite the sandbox's 2-5x host-speed variance.
Reports wall + reduce-side utilization = total worker busy / (wall x M).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")

import bench
from quanta_ray.config import CEPConfig
from quanta_ray.engine import StreamingRunner
from quanta_ray.engine.runner import plan_worker_slots
from quanta_ray.pipelines.flagship import default_spec
from quanta_ray.state.checkpoint import latest_committed_epoch, read_manifest

files, n_turns = bench.prepare_stream()
for f in files:
    open(f, "rb").read()

M = len(plan_worker_slots(bench.BENCH_PARTITIONS, ncpu))

CONFIGS = json.loads(
    os.environ.get(
        "TUNE_CONFIGS",
        '[{"inflight":8,"reb":2},{"inflight":16,"reb":1},{"inflight":8,"reb":0},{"inflight":12,"reb":1}]',
    )
)
REPS = int(os.environ.get("TUNE_REPS", "2"))

def run_cfg(c: dict) -> dict:
    out_dir = "/dev/shm/quanta-tune"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CEPConfig(num_partitions=bench.BENCH_PARTITIONS)
    spec = default_spec(files, cfg)
    spec = dataclasses.replace(
        spec,
        source=dataclasses.replace(spec.source, max_inflight_epochs=c["inflight"]),
        checkpoint_every=8,
        rebalance_every=c["reb"],
    )
    r = StreamingRunner(spec, out_dir)
    r.prepare_workers()
    t0 = time.time()
    summary = r.run()
    wall = time.time() - t0
    busy = 0.0
    for e in range(latest_committed_epoch(out_dir) + 1):
        m = read_manifest(out_dir, e)
        for pm in m["metrics"]:
            busy += sum(pm.get(k, 0.0) for k in ("t_ingest", "t_emit", "t_write", "t_ckpt"))
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "wall": round(wall, 2),
        "tps": round(n_turns / wall),
        "busy": round(busy, 1),
        "util": round(busy / (wall * M), 3),
        "migs": len(summary.get("migrations", [])),
    }

for rep in range(REPS):
    for c in CONFIGS:
        print(json.dumps({**c, **run_cfg(c), "rep": rep}))

ray.shutdown()
