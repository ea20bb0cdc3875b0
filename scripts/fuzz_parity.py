"""Engine-vs-oracle soak fuzz: random streams × random CEP configs ×
random execution geometry, full-stream parity on all five output streams.

Dimensions randomized per trial (the recorded fuzz config):
  stream geometry   n_convs, n_epochs, p_late, seed, row_group_size
  CEP config        lateness, tumbling, sliding, session gap, join bound
  partitioning      P ∈ {2,3,5}, fragment_rows ∈ {100, 131072}
  migration         rebalance_every ∈ {0,1,2} (cost-EMA partition moves)
  checkpointing     checkpoint_every ∈ {1,2,4}
  commit mode       ooo_commit ∈ {False, True}  (out-of-order completion
                    window + contiguous-prefix commit)
  source kind       parquet-stream (1/2) | jsonl | csv | ipc | orc — the
                    same stream re-serialized through an alternate
                    registry driver, crossed with every other dimension
  top-k stream      topk_k ∈ {0, 1, 4} (windowed exact top-k)
  session quantiles sess_quantiles ∈ {off, (0.5), (0.25,0.5,0.95)} x
                    bin ∈ {30s, 120s} (running mergeable-histogram stream)
  kill/resume       ~1/3 of trials crash after a random committed epoch
                    and resume in a fresh runner before the oracle diff
  transformer chain normalize | normalize+fanout (1→2) | drop_role+normalize
                    | normalize+retry_odd (per-row RETRY/DROP status col)
                    | normalize+enrich (broadcast dimension lookup)
  drift stream      role_drift ∈ {off, on} (chained role-mix L1 reducer)
  absence stream    noreply_timeout ∈ {off, 600s, 2700s} (event-time timers)
  late side output  late_output ∈ {off, on} (watermark-dropped rows stream)
  new-conv stream   new_convs ∈ {off, on} (acquisition curve, driver chain state)

Usage: python scripts/fuzz_parity.py [n_trials] [master_seed]
Prints one line per trial and a final ``FAILS: n``.
"""
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec, US
from quanta_ray.engine import StreamingRunner
from quanta_ray.fixtures import TranscriptParams, generate_transcripts, write_stream
from quanta_ray.oracle import run_oracle
from quanta_ray.sinks.exactly_once import read_committed
from quanta_ray.stages import NormalizeStage, RetryingStage
from quanta_ray.stages.transforms import DropRoleStage, FanoutStage, RetryOddStage

SORT_KEYS = {
    "turns": ["conv_id", "turn_idx"],
    "tumbling": ["conv_id", "w_start"],
    "sliding": ["conv_id", "w_start"],
    "sessions": ["conv_id", "session_id"],
    "joins": ["conv_id", "tool_turn_idx"],
    "patterns": ["conv_id", "start_ts", "start_turn_idx"],
    "count_windows": ["conv_id", "window_id"],
    "alerts": ["w_start", "scope"],
    "topk": ["w_start", "rank"],
    "sessquant": ["epoch", "q"],
    "convhist": ["w_start", "bucket"],
    "tooluse": ["w_start", "tool"],
    "resplat": ["conv_id"],
    "runs": ["conv_id", "start_ts", "start_turn_idx"],
    "drift": ["w_start"],
    "noreply": ["conv_id", "ts", "turn_idx"],
    "late": ["conv_id", "turn_idx", "ts"],
    "newconvs": ["w_start"],
}


def srt(t, keys):
    idx = pa.compute.sort_indices(t, sort_keys=[(k, "ascending") for k in keys])
    return t.take(idx).combine_chunks()


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    master = int(sys.argv[2]) if len(sys.argv) > 2 else 4242
    rng = np.random.default_rng(master)
    fails = 0
    for trial in range(n_trials):
        seed = int(rng.integers(0, 100000))
        n_convs = int(rng.integers(3, 40))
        n_epochs = int(rng.integers(2, 7))
        lateness = int(rng.choice([60, 300, 900, 1800]))
        tum = int(rng.choice([600, 1800, 3600]))
        slide = int(rng.choice([300, 900]))
        gap = int(rng.choice([120, 600, 1200]))
        bound = int(rng.choice([300, 1800, 3600]))
        p_late = float(rng.choice([0.0, 0.02, 0.1]))
        reb = int(rng.choice([0, 1, 2]))
        ckpt_every = int(rng.choice([1, 2, 4]))
        P = int(rng.choice([2, 3, 5]))
        ooo = bool(rng.integers(0, 2))
        pat = [
            ("user", "assistant", "tool"),
            ("user", "assistant"),
            ("assistant", "tool"),
            ("user", "assistant", "user"),  # non-adjacent repeat: supported
        ][int(rng.integers(0, 4))]
        params = TranscriptParams(
            n_convs=n_convs, seed=seed, n_epochs=n_epochs, p_late=p_late
        )
        cfg = CEPConfig(
            num_partitions=P,
            allowed_lateness_us=lateness * US,
            tumbling_size_us=tum * US,
            sliding_size_us=(slide * 4) * US,
            sliding_slide_us=slide * US,
            session_gap_us=gap * US,
            join_bound_us=bound * US,
            pattern_roles=pat,
            count_window_size=int(rng.choice([0, 3, 16])),
            alert_ratio=float(rng.choice([0.0, 1.1, 2.0])),
            alert_scopes=[("all",), ("all", "user", "assistant", "tool"), ("tool",)][
                int(rng.integers(0, 3))
            ],
            topk_k=int(rng.choice([0, 1, 4])),
            sess_quantiles=[(), (0.5,), (0.25, 0.5, 0.95)][int(rng.integers(0, 3))],
            sess_hist_bin_us=int(rng.choice([30, 120])) * US,
            conv_hist=bool(rng.integers(0, 2)),
            tool_usage=bool(rng.integers(0, 2)),
            resp_latency=bool(rng.integers(0, 2)),
            run_min_len=int(rng.choice([0, 2, 3])),
            role_drift=bool(rng.integers(0, 2)),
            noreply_timeout_us=int(rng.choice([0, 600, 2700])) * US,
            late_output=bool(rng.integers(0, 2)),
            new_convs=bool(rng.integers(0, 2)),
        )
        d = tempfile.mkdtemp(dir="/tmp", prefix="fuzz-")
        try:
            files = write_stream(
                generate_transcripts(params), d + "/s", n_epochs,
                row_group_size=int(rng.choice([50, 65536])),
            )
            # source-kind cross-dimension: half the trials run the SAME
            # stream through an alternate driver (jsonl or csv: ts as
            # epoch-µs ints + .maxts sidecar; arrow IPC: native types,
            # multi-batch files, NO sidecar — exercises the batch-header
            # max-ts fallback; orc: multi-stripe epochs, narrow-column
            # max-ts fallback), crossing it with every other dimension
            # (ooo, scopes, chains, P)
            src_kind = "parquet-stream"
            pfiles = files  # the oracle always reads the parquet form
            kind_roll = int(rng.integers(0, 8))
            if kind_roll == 2:
                import pyarrow.ipc as pa_ipc

                afiles = []
                for i, f in enumerate(files):
                    t = pq.read_table(f)
                    ap = f"{d}/s-epoch-{i:05d}.arrow"
                    half = max(1, t.num_rows // 2)
                    with pa_ipc.new_file(ap, t.schema) as w:
                        for b in t.slice(0, half).to_batches():
                            w.write_batch(b)
                        for b in t.slice(half).to_batches():
                            w.write_batch(b)
                    afiles.append(ap)
                files = afiles
                src_kind = "ipc-stream"
            elif kind_roll == 3:
                from pyarrow import orc as pa_orc

                afiles = []
                for i, f in enumerate(files):
                    t = pq.read_table(f)
                    ts_i = t.schema.get_field_index("ts")
                    t = t.set_column(ts_i, "ts", t.column("ts").cast(pa.int64()))
                    ap = f"{d}/s-epoch-{i:05d}.orc"
                    # small batch/stripe sizes force multi-stripe epochs
                    # (sub-file fragments + narrow-column max-ts fallback)
                    pa_orc.write_table(t, ap, batch_size=64, stripe_size=1024)
                    afiles.append(ap)
                files = afiles
                src_kind = "orc-stream"
            elif kind_roll < 2:
                alt = "jsonl" if kind_roll == 0 else "csv"
                afiles = []
                for i, f in enumerate(files):
                    t = pq.read_table(f)
                    ts_i = t.schema.get_field_index("ts")
                    t = t.set_column(ts_i, "ts", t.column("ts").cast(pa.int64()))
                    ap = f"{d}/s-epoch-{i:05d}.{alt}"
                    if alt == "jsonl":
                        t.to_pandas().to_json(ap, orient="records", lines=True)
                    else:
                        from pyarrow import csv as pa_csv

                        pa_csv.write_csv(t, ap)
                    import pyarrow.compute as _pc

                    with open(ap + ".maxts", "w") as fh:
                        fh.write(str(_pc.max(t.column("ts")).as_py()))
                    afiles.append(ap)
                files = afiles
                src_kind = f"{alt}-stream"
            chain_kind = int(rng.integers(0, 5))
            if chain_kind == 0:
                tf = (StageSpec(name="normalize"),)
                stages = [RetryingStage(NormalizeStage())]
            elif chain_kind == 4:
                from quanta_ray.stages.transforms import EnrichStage

                tf = (StageSpec(name="normalize"), StageSpec(name="enrich"))
                stages = [RetryingStage(NormalizeStage()),
                          RetryingStage(EnrichStage())]
            elif chain_kind == 1:
                tf = (StageSpec(name="normalize"), StageSpec(name="fanout"))
                stages = [RetryingStage(NormalizeStage()), RetryingStage(FanoutStage())]
            elif chain_kind == 2:
                tf = (StageSpec(name="drop_role", options={"role": "user"}),
                      StageSpec(name="normalize"))
                stages = [RetryingStage(DropRoleStage(role="user")),
                          RetryingStage(NormalizeStage())]
            else:
                # per-row status granularity: odd turn_idx RETRY once,
                # every 7th DROP — oracle mirrors via apply_row
                tf = (StageSpec(name="normalize"),
                      StageSpec(name="retry_odd",
                                options={"fail_times": 1, "drop_mod": 7}))
                stages = [RetryingStage(NormalizeStage()),
                          RetryingStage(RetryOddStage(fail_times=1, drop_mod=7))]
            spec = PipelineSpec(
                source=SourceSpec(
                    kind=src_kind,
                    paths=tuple(files),
                    fragment_rows=int(rng.choice([100, 131072])),
                    ooo_commit=ooo,
                ),
                transformers=tf,
                cep=cfg,
                checkpoint_every=ckpt_every,
                rebalance_every=reb,
                rebalance_ratio=1.0,
            )
            out = d + "/out"
            # kill/resume cross-dimension: ~1/3 of trials crash the runner
            # after a random committed epoch and resume in a FRESH runner —
            # the resumed engine must still match the oracle exactly (state
            # restore, deterministic replay, manifest-carried reducer
            # state for alerts/sessquant all on the line)
            kill_at = None
            if rng.integers(0, 3) == 0 and n_epochs > 1:
                kill_at = int(rng.integers(0, n_epochs - 1))
                s1 = StreamingRunner(spec, out).run(stop_after_epoch=kill_at)
                assert s1["status"] == "stopped"
            s = StreamingRunner(spec, out).run()
            assert s["status"] == "complete"
            oracle = run_oracle((pq.read_table(f) for f in pfiles), cfg, stages=stages)
            ok = True
            for stream, keys in SORT_KEYS.items():
                got = read_committed(out, stream)
                want = oracle[stream]
                if want.num_rows == 0:
                    if got is not None and got.num_rows:
                        ok = False
                        print(f"trial {trial}: {stream} expected empty", flush=True)
                    continue
                if got is None:
                    ok = False
                    print(f"trial {trial}: {stream} missing", flush=True)
                    continue
                if stream == "turns" and chain_kind == 1:
                    keys = ["conv_id", "turn_idx", "fanout_copy"]
                g = srt(got.select(want.column_names), keys)
                w = srt(want, keys)
                if not g.equals(w):
                    ok = False
                    print(
                        f"trial {trial} FAIL {stream}: seed={seed} convs={n_convs} "
                        f"ep={n_epochs} late={lateness} tum={tum} slide={slide} "
                        f"gap={gap} bound={bound} p_late={p_late} reb={reb} "
                        f"ck={ckpt_every} P={P} ooo={ooo} chain={chain_kind}",
                        flush=True,
                    )
            if not ok:
                fails += 1
            else:
                print(
                    f"trial {trial} ok (seed={seed} P={P} reb={reb} ooo={int(ooo)} "
                    f"chain={chain_kind} src={src_kind.split('-')[0]} "
                    f"kill={'-' if kill_at is None else kill_at} "
                    f"migs={len(s.get('migrations', []))})",
                    flush=True,
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("FAILS:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
