"""quanta_ray — a Ray-Data-native structured-streaming / CEP engine.

A from-scratch re-expression of the capabilities of the reference engine
(``mohsanabbas/quanta``, a Go Kafka→gRPC-transformer→sink streaming runner;
see ``/root/reference``) as a Ray Data pipeline system over Parquet
transcript tables:

- **Source**: an ordered Parquet file stream ("topic"); offsets are
  ``(epoch/file_idx, row_idx)`` (reference analog: Kafka consumer source,
  ``source/kafka/driver_sarama.go:71-214``).
- **Transformers**: vectorized Arrow ``map_batches`` stages with the
  reference's per-row status semantics OK/DROP/RETRY/ERROR
  (``internal/pipeline/runner.go:120-200``, ``transformer.proto:79-84``) —
  no gRPC hop; a stage is a Python callable / actor class.
- **CEP runtime** (required by the north rule, absent in the reference):
  event-time tumbling/sliding/session windows keyed on ``conv_id``,
  watermark-driven eviction, a stateful tool-call→assistant-turn
  stream-stream join, explicit hash partitioning with salt support.
- **Sink**: exactly-once Parquet output via a two-phase-commit manifest
  (reference analog: end-to-end ack commit, ``source/kafka/checkpoint.go``).
- **Checkpoint/resume**: per-partition operator state + offsets committed
  atomically with the output manifest.

Layout:
  schema.py      — Arrow schemas + lineage columns
  config.py      — engine/pipeline config (YAML spec, schema_version=v1)
  fixtures.py    — deterministic synthetic transcript generator
  oracle.py      — single-threaded reference interpreter (the semantics spec)
  stages/       — transform stage library (status semantics, text transforms)
  sources/      — streaming parquet source + registry
  sinks/        — exactly-once manifest sink + registry
  state/        — watermark + checkpoint/commit-watermark trackers
  engine/       — the streaming runner (epoch loop, partition actors)
  functions/    — text analysis, dedup, similarity search, multimodal stubs
  pipelines/    — batch-mode Ray Data pipelines (windows, joins, relational)
"""

__version__ = "0.1.0"


def _filter_ray_schema_hash_noise() -> None:
    """Silence Ray Data's cosmetic 'Failed to hash the schemas (for
    deduplication): unhashable type' warning: pa.Table.from_pandas attaches
    pandas metadata that makes pa.Schema unhashable, so Ray's early-exit
    schema dedup (transform_pyarrow.py) logs a warning and falls through to
    the full (correct) unify path. Purely cosmetic — filtered at the emitting
    logger; installed on package import, which happens in both the driver
    and (via cloudpickled stage closures) every map worker."""
    import logging

    class _Drop(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_Drop())


_filter_ray_schema_hash_noise()
