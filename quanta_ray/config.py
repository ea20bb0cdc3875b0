"""Engine + pipeline configuration.

Mirrors the reference's versioned YAML pipeline spec and source config
(``/root/reference/internal/spec/spec.go:17-44``,
``internal/config/pipeline.go:15-35`` — ``schema_version: v1`` enforced;
``source/kafka/config.go:46-90`` — defaults + ``QUANTA_KAFKA__*`` env overlay)
as plain dataclasses with a YAML-ish dict loader and ``QUANTA_RAY__*`` env
overrides.

``CEPConfig`` is the semantic contract shared by the streaming engine, the
batch pipelines and the single-threaded oracle — every duration is in integer
microseconds so watermark arithmetic is exact and identical everywhere.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any

SCHEMA_VERSION = "v1"

US = 1_000_000  # microseconds per second


@dataclass(frozen=True)
class CEPConfig:
    """Event-time/CEP semantics knobs (all durations in microseconds)."""

    allowed_lateness_us: int = 300 * US  # 5 min
    tumbling_size_us: int = 3600 * US  # 1 h
    sliding_size_us: int = 3600 * US  # 1 h
    sliding_slide_us: int = 900 * US  # 15 min
    session_gap_us: int = 600 * US  # 10 min
    join_bound_us: int = 3600 * US  # tool→assistant match horizon
    num_partitions: int = 8
    # emit everything still buffered when the stream ends (watermark → +inf)
    final_flush: bool = True
    # CEP sequence pattern: emit a match for every run of CONSECUTIVE turns
    # (per conv, final (ts, turn_idx) order) whose roles equal this tuple.
    # Empty tuple disables the stream.
    pattern_roles: tuple = ("user", "assistant", "tool")
    # COUNT-trigger tumbling windows: chunk each conv's turns (final
    # (ts, turn_idx) order) into consecutive groups of this many rows; a
    # window emits when its last row is final (wm past its ts), the partial
    # tail at final flush. 0 disables the stream (default: the headline
    # bench measures the north-rule operator set; enable per spec).
    count_window_size: int = 0
    # GLOBAL burst-alert stream (two-level streaming aggregate): per tumbling
    # window, sum turn counts ACROSS ALL partitions (workers return tiny
    # per-window partials with their commit metadata; the driver folds them
    # in epoch order — O(windows/epoch), never row-proportional) and emit an
    # alert when a window's global count ≥ alert_ratio × the previous
    # non-empty window's count. The O(1) reducer state (last window, count)
    # rides in every manifest, so resume continues the chain exactly.
    # 0 disables the stream.
    alert_ratio: float = 0.0
    # independent alert chains (grouped second-level reduce): 'all' chains
    # the total turn count; a role name chains that role's count only — a
    # window with zero turns OF THAT ROLE does not advance the role's chain
    # (same "previous non-empty window" rule, per key).
    alert_scopes: tuple = ("all",)
    # windowed EXACT top-k stream: per final tumbling window, the k most
    # active conversations globally. Exact with no sketch and no extra
    # shuffle: a conv lives in exactly one partition, so each worker's local
    # top-k over its newly-final windows is complete for its convs and the
    # driver merges M k-sized lists per window at commit (O(k·M·windows/
    # epoch), never conv- or row-proportional). 0 disables the stream.
    topk_k: int = 0
    # running SESSION-DURATION QUANTILE stream (streaming mergeable sketch):
    # per epoch that closes >= 1 session, emit the requested quantiles of
    # ALL sessions closed so far, estimated from a fixed-bin histogram of
    # durations. Workers return O(touched bins) integer partials with their
    # commit metadata; the driver folds them into the cumulative histogram
    # (O(sess_hist_bins) state, persisted in every manifest — resume
    # continues the running estimate exactly). Estimates are deterministic
    # (upper bin edge at the smallest cumulative count >= ceil(q*total)).
    # Empty tuple disables the stream.
    sess_quantiles: tuple = ()
    sess_hist_bin_us: int = 60 * US   # 1-minute duration resolution
    sess_hist_bins: int = 256         # durations >= bins*bin clip to the top bin
    # windowed CONVERSATION-ACTIVITY HISTOGRAM stream (grouped global
    # reduce): per final tumbling window, how many conversations had
    # 1 / 2-3 / 4-7 / 8-15 / 16+ turns — the fan-out-distribution monitor.
    # Like topk, a pure function of the final tumbling output: each worker
    # returns one 5-int vector per newly-final window (complete for its
    # convs), the driver vector-adds at commit; no cross-epoch state.
    # False disables the stream.
    conv_hist: bool = False
    # windowed TOOL-USAGE stream (multi-key grouped global reduce): per
    # final tumbling window AND tool name, the global number of tool-call
    # rows and the EXACT number of distinct conversations that called the
    # tool in the window. Convs are partition-disjoint under the conv_id
    # hash shuffle, so each worker's per-(window, tool) (n_calls,
    # n_distinct_convs) partial is complete for its convs and the driver's
    # commit fold just SUMS — exact distinct with no sketch and no extra
    # shuffle. Worker state is O(open windows x tools x touched convs),
    # the same order as the window state itself; windows finalize in
    # exactly one epoch, so no cross-epoch reducer state. False disables.
    tool_usage: bool = False
    # windowed ROLE-MIX DRIFT stream (chained global reduce): per final
    # non-empty tumbling window with a predecessor, the EXACT L1 distance
    # between the window's global role distribution and the previous
    # non-empty window's — the distribution-shift monitor. Reuses the
    # alert stream's per-window (n_turns, n_user, n_assistant, n_tool)
    # partials (O(windows/epoch) scalars, never row-proportional); the
    # driver chains windows in w_start order and emits the cross-multiplied
    # integer form (l1_num = Σ|n_r·M − m_r·N|, l1_den = N·M — order-free,
    # bit-exact vs the sequential oracle). The O(1) reducer state (last
    # window, last 4 counts) rides in every manifest, so resume continues
    # the chain exactly. False disables the stream.
    role_drift: bool = False
    # FIRST-RESPONSE LATENCY stream (per-conversation event-time result,
    # emitted exactly once): for every conversation, the first user turn's
    # timestamp, the first assistant turn's timestamp, and their signed
    # difference in microseconds (negative when the assistant spoke before
    # any user turn). A conversation's row is FINAL — and emitted — once
    # the watermark passes both per-role minima (late rows are ts < wm, so
    # neither minimum can decrease afterwards); conversations that never
    # see both roles emit nothing (final_flush emits the rest at close).
    # O(1) integers per seen conversation of worker state. False disables.
    resp_latency: bool = False
    # RUN-LENGTH QUANTIFIER stream (CEP times(K,) / MATCH_RECOGNIZE A{K,}):
    # emit every MAXIMAL run of >= run_min_len consecutive same-role turns
    # of a conversation (final (ts, turn_idx) order) — the runaway
    # same-role-loop detector. A run is final (and emitted, once) when a
    # different-role turn follows it strictly below the watermark (nothing
    # can insert under wm), or at final flush for still-open runs. Worker
    # state is O(convs + rows above wm): the finalized prefix compacts to
    # one (role, len, start, end) tail summary per conversation. 0 disables.
    run_min_len: int = 0
    # ABSENCE / TIMEOUT stream (CEP notFollowedBy + event-time timers):
    # emit every USER turn with NO assistant turn of the same conversation
    # in (ts, ts + noreply_timeout_us] — the abandonment/no-reply monitor.
    # The window is half-open (a simultaneous assistant turn does not
    # answer) and inclusive at +timeout. A pending user turn is FINAL (and
    # emitted, once) when wm > ts + timeout: any later accepted assistant
    # row has a_ts >= wm > ts + timeout and can no longer answer it.
    # Worker state is two bounded sets: pending user turns (live at most
    # timeout past the watermark) and retained assistant timestamps with
    # a_ts > wm (older ones can answer no future-accepted user turn, since
    # answering needs a_ts > u_ts >= wm). 0 disables the stream.
    noreply_timeout_us: int = 0
    # NEW-CONVERSATION ACQUISITION stream (two-level reduce + driver chain
    # state): per tumbling window, the number of conversations whose
    # GLOBAL first turn falls in it — the acquisition/cohort-entry curve.
    # A conversation's first-turn minimum is FINAL once min <= wm (the
    # resplat argument: late rows are ts < wm, nothing accepted can lower
    # a passed minimum), and window w is COMPLETE once wm >= w + size (a
    # later-accepted row has ts >= wm and can neither start a new conv in
    # w nor lower an existing min into w). Convs are partition-disjoint
    # under the conv_id hash shuffle, so per-partition newly-final counts
    # SUM exactly; the driver accumulates per-window partials in
    # manifest-carried state and emits each window once its completion
    # watermark passes. False disables.
    new_convs: bool = False
    # LATE-DATA SIDE OUTPUT (Flink/Beam side-output parity): rows dropped
    # by the watermark late filter are committed to a "late" output stream
    # (raw pre-transform row + the epoch it arrived in + the watermark it
    # was late against) instead of only being counted. Drop semantics are
    # unchanged — late rows never flow downstream — but they become an
    # inspectable, exactly-once-committed stream (the event-time twin of
    # the dead-letter stream). False disables.
    late_output: bool = False

    def __post_init__(self) -> None:
        # JSON specs deliver lists; normalize so configs hash/compare stably
        object.__setattr__(self, "pattern_roles", tuple(self.pattern_roles))
        object.__setattr__(self, "alert_scopes", tuple(self.alert_scopes))
        object.__setattr__(self, "sess_quantiles", tuple(self.sess_quantiles))
        for q in self.sess_quantiles:
            if not (0.0 < q <= 1.0):
                raise ValueError(f"sess_quantiles must be in (0, 1], got {q}")
        if self.sess_quantiles and (
            self.sess_hist_bin_us <= 0 or self.sess_hist_bins <= 0
        ):
            raise ValueError(
                "sess_hist_bin_us and sess_hist_bins must be positive when "
                "sess_quantiles is set"
            )
        allowed = {"all", "user", "assistant", "tool"}
        bad = [s for s in self.alert_scopes if s not in allowed]
        if bad:
            raise ValueError(
                f"alert_scopes {bad} not in {sorted(allowed)} — "
                "scopes are validated at spec-parse time, before workers start"
            )
        if self.topk_k < 0:
            raise ValueError(f"topk_k must be >= 0, got {self.topk_k}")
        if self.run_min_len < 0:
            raise ValueError(f"run_min_len must be >= 0, got {self.run_min_len}")
        if self.sliding_size_us % self.sliding_slide_us != 0:
            raise ValueError(
                "sliding_size_us must be a multiple of sliding_slide_us "
                f"({self.sliding_size_us} % {self.sliding_slide_us})"
            )

    def replace(self, **kw: Any) -> "CEPConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class RetryPolicy:
    """Per-stage logical retry (reference: ``internal/pipeline/runner.go:135-176``
    — retry ``attempts`` times with fixed ``backoff_ms``, then drop+ack)."""

    attempts: int = 3
    backoff_ms: int = 0  # sleeps are pointless in-process; kept for spec parity


@dataclass(frozen=True)
class StageSpec:
    """One transformer stage (reference: ``internal/spec/spec.go:17-27``)."""

    name: str
    type: str = "inproc"  # the reference's grpc type is replaced by in-process
    # per-call timeout, enforced via a watchdog thread around the stage call
    # (reference: context.WithTimeout per plugin call, runner.go:138-144;
    # timeout → the retry-then-drop+ack path). 0 disables — unlike the
    # reference's RPC hop, an in-process vectorized stage is deterministic,
    # and a universal default would drop data under host contention.
    timeout_ms: int = 0
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    options: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class SourceSpec:
    kind: str = "parquet-stream"
    driver: str = "parquet"
    # ordered file list or a directory; order = arrival order = the "topic"
    paths: tuple[str, ...] = ()
    # flow control (reference: token bucket capacity, source/kafka/config.go:74-79)
    max_inflight_epochs: int = 2
    # target rows per map-side fragment: an epoch file is read by
    # ceil(rows / fragment_rows) parallel tasks split on row-group
    # boundaries, so map parallelism is epochs × fragments, not epochs
    fragment_rows: int = 131072
    # out-of-order completion window. False (default): the in-flight cap
    # bounds UNCOMMITTED epochs, so one straggler epoch head-of-line-blocks
    # dispatch once the window fills. True: the cap bounds INCOMPLETE epochs
    # (completion = every task of the epoch finished), manifests still commit
    # strictly contiguously via ``LowWatermarkTracker`` — the reference's
    # exact semantics: acks tracked out of order, contiguous prefix committed
    # (``/root/reference/source/kafka/checkpoint.go:11-62``) while capacity
    # returns on ack, not on commit (``backpressure.go:9-85``).
    ooo_commit: bool = False
    # safety bound on the completed-but-uncommitted backlog in ooo mode
    # (0 → 4 × max_inflight_epochs)
    max_uncommitted_epochs: int = 0


@dataclass(frozen=True)
class SinkSpec:
    kind: str = "exactly-once-parquet"  # | "fire-and-forget-parquet" | "stdout"
    path: str = ""
    commit_mode: str = "e2e"  # "auto" = no manifest (reference commit modes,
    # source/kafka/config.go:15-20)
    options: dict[str, Any] = field(default_factory=dict)
    # the pass-through "turns" stream is written by this many parallel group
    # tasks per epoch (partition p → group p % G). Part of the JOB layout —
    # fixed across cluster sizes so output file names stay deterministic
    turns_write_groups: int = 8
    # rows dropped after retry exhaustion are committed to a "deadletter"
    # output stream (with _stage/_reason columns) instead of vanishing;
    # the drop+ack semantics are unchanged — dead rows never flow downstream
    dead_letter: bool = True


@dataclass(frozen=True)
class PipelineSpec:
    schema_version: str = SCHEMA_VERSION
    pipeline_id: str = "default"
    source: SourceSpec = field(default_factory=SourceSpec)
    transformers: tuple[StageSpec, ...] = ()
    sink: SinkSpec = field(default_factory=SinkSpec)
    cep: CEPConfig = field(default_factory=CEPConfig)
    # operator-state checkpoint cadence in epochs (reference analog: commit
    # throttle, source/kafka/config.go:80-82). Output manifests still commit
    # every epoch; resume restores the last checkpointed state and replays
    # the (deterministic) epochs since — replayed writes are byte-identical.
    checkpoint_every: int = 1
    # between-epoch work stealing: every K dispatched epochs the driver may
    # move one partition from the most-loaded worker to the least-loaded
    # (EMA of per-partition compute time from committed metrics). Heals
    # slow-node / hot-partition skew without stalling the pipeline (actor
    # call ordering + an extract→adopt ObjectRef dependency replace a
    # drain). 0 disables.
    rebalance_every: int = 2
    # migrate only when max worker load > ratio × min worker load
    rebalance_ratio: float = 1.2
    # live metrics endpoint (reference: internal/telemetry/metrics.go:10-15):
    # the driver serves its folded per-partition metrics as JSON over HTTP
    # while run() executes. -1 = off (default), 0 = ephemeral port (read it
    # back from runner.metrics_url), >0 = fixed port. The QUANTA_METRICS_PORT
    # env var overrides at runner start.
    metrics_port: int = -1


class SpecError(ValueError):
    pass


_KNOWN_SOURCE_KINDS = {"parquet-stream", "jsonl-stream"}
_KNOWN_SINK_KINDS = {"exactly-once-parquet", "fire-and-forget-parquet", "stdout"}


def load_spec(d: dict[str, Any]) -> PipelineSpec:
    """Validate + build a PipelineSpec from a plain dict (parsed YAML/JSON).

    Enforcement mirrors the reference compiler
    (``internal/pipeline/compiler.go:26-100``): unknown schema_version, source
    kind or sink kind are compile errors.
    """
    ver = d.get("schema_version", SCHEMA_VERSION)
    if ver != SCHEMA_VERSION:
        raise SpecError(f"unsupported schema_version {ver!r} (want {SCHEMA_VERSION!r})")
    src = d.get("source", {})
    if src.get("kind", "parquet-stream") not in _KNOWN_SOURCE_KINDS:
        raise SpecError(f"unsupported source kind {src.get('kind')!r}")
    sink = d.get("sink", {})
    if sink.get("kind", "exactly-once-parquet") not in _KNOWN_SINK_KINDS:
        raise SpecError(f"unsupported sink kind {sink.get('kind')!r}")
    stages = []
    for t in d.get("transformers", []):
        if "name" not in t:
            raise SpecError("transformer missing name")
        rp = t.get("retry_policy", {})
        stages.append(
            StageSpec(
                name=t["name"],
                type=t.get("type", "inproc"),
                timeout_ms=int(t.get("timeout_ms", 0)),
                retry=RetryPolicy(
                    attempts=int(rp.get("attempts", 3)),
                    backoff_ms=int(rp.get("backoff_ms", 0)),
                ),
                options=dict(t.get("options", {})),
            )
        )
    cep_d = dict(d.get("cep", {}))
    cep = CEPConfig(**cep_d) if cep_d else CEPConfig()
    return PipelineSpec(
        schema_version=ver,
        pipeline_id=d.get("pipeline_id", "default"),
        source=SourceSpec(
            kind=src.get("kind", "parquet-stream"),
            driver=src.get("driver", "parquet"),
            paths=tuple(src.get("paths", ())),
            max_inflight_epochs=int(src.get("max_inflight_epochs", 2)),
            fragment_rows=int(src.get("fragment_rows", 131072)),
            ooo_commit=bool(src.get("ooo_commit", False)),
            max_uncommitted_epochs=int(src.get("max_uncommitted_epochs", 0)),
        ),
        transformers=tuple(stages),
        sink=SinkSpec(
            kind=sink.get("kind", "exactly-once-parquet"),
            path=sink.get("path", ""),
            commit_mode=sink.get("commit_mode", "e2e"),
            options=dict(sink.get("options", {})),
            turns_write_groups=int(sink.get("turns_write_groups", 8)),
            dead_letter=bool(sink.get("dead_letter", True)),
        ),
        cep=cep,
        checkpoint_every=int(d.get("checkpoint_every", 1)),
        rebalance_every=int(d.get("rebalance_every", 2)),
        rebalance_ratio=float(d.get("rebalance_ratio", 1.2)),
        metrics_port=int(d.get("metrics_port", -1)),
    )


def load_spec_file(path: str) -> PipelineSpec:
    """Load a spec from JSON (or YAML if pyyaml is present — it is optional)."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml  # type: ignore

            d = yaml.safe_load(text)
        except ImportError as e:  # pragma: no cover
            raise SpecError(f"{path}: not JSON and pyyaml unavailable") from e
    return load_spec(_env_overlay(d))


def _env_overlay(d: dict[str, Any]) -> dict[str, Any]:
    """Apply ``QUANTA_RAY__a__b=x`` env overrides (reference analog:
    ``QUANTA_KAFKA__*`` koanf overlay, ``source/kafka/config.go:60``)."""
    for key, val in os.environ.items():
        if not key.startswith("QUANTA_RAY__"):
            continue
        parts = [p.lower() for p in key[len("QUANTA_RAY__") :].split("__")]
        node = d
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            node[parts[-1]] = json.loads(val)
        except json.JSONDecodeError:
            node[parts[-1]] = val
    return d
