"""Streaming Parquet source ("the topic").

The input is an ordered list of Parquet files; file order = arrival order.
Offsets are ``(epoch = file index, row index)`` — the engine's analog of the
reference's Kafka ``(topic, partition, offset)`` checkpoint token
(``/root/reference/api/proto/v1/frame.proto:9-13``); ``start_from``/resume is
an epoch index (reference: ``driver_sarama.go:57-62``).

Watermarks are **precomputed from Parquet footer statistics** — no data read:
``wm_e = max(ts over epochs <= e) - allowed_lateness``. This is identical to
the oracle's definition because a late row (ts < wm at arrival) can never be
the running maximum, so max-over-all-rows == max-over-on-time-rows. Footer
stats make watermark generation O(#files) metadata reads on the driver,
which is what lets every epoch's watermark be known before dispatch and the
whole epoch pipeline run concurrently under bounded in-flight control.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def list_epoch_files(paths_or_dir: str | list[str] | tuple[str, ...]) -> list[str]:
    """Ordered epoch file list. A directory is expanded to its sorted
    ``*.parquet`` entries (lexicographic = epoch order by construction)."""
    if isinstance(paths_or_dir, (list, tuple)):
        out: list[str] = []
        for p in paths_or_dir:
            out.extend(list_epoch_files(p))
        return out
    if os.path.isdir(paths_or_dir):
        return sorted(
            os.path.join(paths_or_dir, f)
            for f in os.listdir(paths_or_dir)
            if f.endswith(".parquet")
        )
    if not os.path.exists(paths_or_dir):
        raise FileNotFoundError(f"source path does not exist: {paths_or_dir}")
    return [paths_or_dir]


def epoch_max_ts_us(path: str, ts_col: str = "ts") -> int:
    """Max ts of a file from row-group footer statistics (no data read)."""
    md = pq.read_metadata(path)
    idx = md.schema.names.index(ts_col)
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:  # fall back to reading the column
            col = pq.read_table(path, columns=[ts_col]).column(0)
            import pyarrow.compute as pc

            return pc.max(col).cast(pa.int64()).as_py()
        # use the raw physical value (int64 epoch-us for timestamp[us]);
        # st.max is a naive datetime whose .timestamp() would apply the
        # local timezone — never use it for semantics
        v_us = int(st.max_raw)
        mx = v_us if mx is None else max(mx, v_us)
    if mx is None:
        return -(1 << 62)
    return mx


def precompute_watermarks(
    files: list[str], allowed_lateness_us: int, driver=None
) -> tuple[list[int], list[int]]:
    """Returns (prefix_max_ts[e], wm[e]) for every epoch e."""
    max_ts = driver.max_ts_us if driver is not None else epoch_max_ts_us
    prefix: list[int] = []
    cur = -(1 << 62)
    for f in files:
        cur = max(cur, max_ts(f))
        prefix.append(cur)
    wms = [m - allowed_lateness_us if m > -(1 << 61) else -(1 << 62) for m in prefix]
    return prefix, wms


def plan_fragments(path: str, target_rows: int) -> list[tuple[int, int, int]]:
    """Split an epoch file into map fragments on row-group boundaries.

    Returns ``[(rg_lo, rg_hi, row_offset), ...]`` where ``row_offset`` is the
    file-global row index of the fragment's first row (the lineage offset
    base). Greedy: row groups accumulate until ``target_rows``. A file
    written as one giant row group yields a single fragment — splitting
    below row-group granularity would re-read the whole group per task.
    Metadata-only (no data read), like the watermark precompute."""
    md = pq.read_metadata(path)
    frags: list[tuple[int, int, int]] = []
    lo = 0
    off = 0
    acc = 0
    frag_off = 0
    for rg in range(md.num_row_groups):
        n = md.row_group(rg).num_rows
        acc += n
        off += n
        if acc >= target_rows:
            frags.append((lo, rg + 1, frag_off))
            lo = rg + 1
            frag_off = off
            acc = 0
    if lo < md.num_row_groups or not frags:
        frags.append((lo, md.num_row_groups, frag_off))
    return frags


# Source driver registry (reference analog: ``source/kafka/registry.go:5-18``;
# the reference registers one real driver, "sarama", and keeps empty
# placeholders as the extension surface — here BOTH entries are real,
# see SOURCE_DRIVERS below; this name is the back-compat alias).


# --- pluggable source drivers ---------------------------------------------------
#
# The reference keeps empty placeholder drivers next to its one real Kafka
# driver as the extension surface (``source/kafka/registry.go:5-18``). Here
# the surface is REAL: a driver supplies the four primitives the runner
# needs (file listing, footer-level max-ts, fragment planning, fragment
# read); everything else — watermarks, lineage offsets, retry/commit,
# partitioning — is driver-independent engine code.


class ParquetStreamDriver:
    """The default driver: Parquet epoch files. Max-ts and fragment planning
    are METADATA-only (footer statistics / row-group index)."""

    ext = ".parquet"

    def list_files(self, paths_or_dir) -> list[str]:
        return list_epoch_files(paths_or_dir)

    def max_ts_us(self, path: str, ts_col: str = "ts") -> int:
        return epoch_max_ts_us(path, ts_col)

    def plan_fragments(self, path: str, target_rows: int) -> list[tuple[int, int, int]]:
        return plan_fragments(path, target_rows)

    def read_fragment(self, path: str, lo: int, hi: int | None) -> pa.Table:
        pf = pq.ParquetFile(path)
        if hi is None:
            hi = pf.metadata.num_row_groups
        return pf.read_row_groups(list(range(lo, hi)))


class JsonlStreamDriver:
    """Newline-delimited-JSON epoch files (``ts`` = int64 epoch-µs in the
    record envelope, like a Kafka message timestamp).

    Honest trade vs Parquet: JSONL has no footer, so max-ts uses a sidecar
    ``<file>.maxts`` when the producer wrote one (O(1), the Kafka-envelope
    analog) and otherwise falls back to scanning the file once on the
    driver (O(data) — documented, and the reason the default topic format
    is Parquet). Fragmenting below file granularity would need newline-
    aligned byte splits whose global row offsets (lineage) require a count
    pass; a v1 epoch is therefore ONE fragment."""

    ext = ".jsonl"

    def list_files(self, paths_or_dir) -> list[str]:
        if isinstance(paths_or_dir, (list, tuple)):
            out: list[str] = []
            for p in paths_or_dir:
                out.extend(self.list_files(p))
            return out
        if os.path.isdir(paths_or_dir):
            return sorted(
                os.path.join(paths_or_dir, f)
                for f in os.listdir(paths_or_dir)
                if f.endswith(self.ext)
            )
        if not os.path.exists(paths_or_dir):
            raise FileNotFoundError(f"source path does not exist: {paths_or_dir}")
        return [paths_or_dir]

    # JSON text carries no integer-width info; restore the envelope widths
    # of the transcript contract so committed output schemas are identical
    # across drivers (input_hint: turn_idx int32, everything else int64).
    _NARROW = {"turn_idx": pa.int32()}

    def _read(self, path: str) -> pa.Table:
        from pyarrow import json as pa_json

        t = pa_json.read_json(path)
        ts = t.column("ts")
        if not pa.types.is_timestamp(ts.type):
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts",
                ts.cast(pa.int64()).cast(pa.timestamp("us")),
            )
        for name, typ in self._NARROW.items():
            i = t.schema.get_field_index(name)
            if i >= 0 and t.schema.field(i).type != typ:
                t = t.set_column(i, name, t.column(name).cast(typ))
        return t

    def max_ts_us(self, path: str, ts_col: str = "ts") -> int:
        side = path + ".maxts"
        if os.path.exists(side):
            with open(side) as f:
                return int(f.read().strip())
        import pyarrow.compute as pc

        t = self._read(path)
        if not t.num_rows:
            return -(1 << 62)
        return pc.max(t.column(ts_col).cast(pa.int64())).as_py()

    def plan_fragments(self, path: str, target_rows: int) -> list[tuple[int, int, int]]:
        return [(0, None, 0)]

    def read_fragment(self, path: str, lo: int, hi: int | None) -> pa.Table:
        assert lo == 0, "jsonl epochs are single-fragment"
        return self._read(path)


class CsvStreamDriver(JsonlStreamDriver):
    """CSV epoch files with the same record envelope (``ts`` = int64
    epoch-µs). Shares the JSONL driver's listing / sidecar-max-ts /
    single-fragment contract — only the decode differs: ``pyarrow.csv``
    with explicit column types (CSV text carries no type info at all, so
    the whole transcript schema is pinned, not just the narrow columns;
    quoted fields keep embedded commas/newlines in ``text`` intact)."""

    ext = ".csv"

    _TYPES = {
        "conv_id": pa.string(),
        "turn_idx": pa.int32(),
        "role": pa.string(),
        "text": pa.string(),
        "tool": pa.string(),
        "ts": pa.int64(),
    }

    def _read(self, path: str) -> pa.Table:
        from pyarrow import csv as pa_csv

        t = pa_csv.read_csv(
            path,
            # multiline quoted text: without newlines_in_values the chunked
            # parser desyncs on any epoch file > one parse block whose text
            # field contains a newline (pyarrow raises 'CSV parser got out
            # of sync with chunker')
            parse_options=pa_csv.ParseOptions(newlines_in_values=True),
            convert_options=pa_csv.ConvertOptions(
                column_types=self._TYPES, strings_can_be_null=False
            ),
        )
        i = t.schema.get_field_index("ts")
        t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("us")))
        # empty-string round-trip: csv writes "" and reads it back as ""
        # only with strings_can_be_null=False (default would make it null,
        # breaking byte-parity with the parquet driver)
        return t


class ArrowIpcStreamDriver(JsonlStreamDriver):
    """Arrow IPC (Feather v2) epoch files — the zero-copy wire format.

    Types survive natively (no envelope re-widening needed), and unlike the
    text drivers IPC files fragment below file granularity: record batches
    are the row-group analog, their row counts come from batch headers over
    a memory map (lazy pages, no column data touched), so ``plan_fragments``
    mirrors the Parquet driver's greedy metadata-only split. max-ts uses
    the ``.maxts`` sidecar when the producer wrote one; the fallback scans
    only the ``ts`` column's pages of each batch (mmap: other columns are
    never faulted in)."""

    ext = ".arrow"

    def _open(self, path: str):
        import pyarrow.ipc as pa_ipc

        return pa_ipc.open_file(pa.memory_map(path))

    def max_ts_us(self, path: str, ts_col: str = "ts") -> int:
        side = path + ".maxts"
        if os.path.exists(side):
            with open(side) as f:
                return int(f.read().strip())
        import pyarrow.compute as pc

        r = self._open(path)
        mx = -(1 << 62)
        for i in range(r.num_record_batches):
            col = r.get_batch(i).column(ts_col)
            if len(col):
                mx = max(mx, pc.max(col.cast(pa.int64())).as_py())
        return mx

    def plan_fragments(self, path: str, target_rows: int) -> list[tuple[int, int, int]]:
        r = self._open(path)
        nb = r.num_record_batches
        frags: list[tuple[int, int, int]] = []
        lo = off = acc = frag_off = 0
        for b in range(nb):
            n = r.get_batch(b).num_rows
            acc += n
            off += n
            if acc >= target_rows:
                frags.append((lo, b + 1, frag_off))
                lo, frag_off, acc = b + 1, off, 0
        if lo < nb or not frags:
            frags.append((lo, nb, frag_off))
        return frags

    def read_fragment(self, path: str, lo: int, hi: int | None) -> pa.Table:
        r = self._open(path)
        if hi is None:
            hi = r.num_record_batches
        batches = [r.get_batch(i) for i in range(lo, hi)]
        if not batches:
            return r.schema.empty_table()
        t = pa.Table.from_batches(batches)
        ts = t.column("ts")
        if not pa.types.is_timestamp(ts.type):
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts",
                ts.cast(pa.int64()).cast(pa.timestamp("us")),
            )
        return t


class OrcStreamDriver(JsonlStreamDriver):
    """ORC epoch files — the columnar warehouse interchange format.

    Stripes are ORC's row-group analog and fragment below file granularity:
    ``plan_fragments`` packs whole stripes to the row target. pyarrow's ORC
    reader exposes no stripe-row-count metadata, so the planner reads the
    single narrow ``ts`` column per stripe (one column's pages, never the
    payload columns) — more than Parquet's footer-only split, far less
    than a data scan; the same narrow read serves the max-ts fallback when
    no ``.maxts`` sidecar exists. Types survive natively, so like the IPC
    driver no envelope re-widening is needed beyond ts → timestamp[us]."""

    ext = ".orc"

    def _open(self, path: str):
        from pyarrow import orc as pa_orc

        return pa_orc.ORCFile(path)

    def max_ts_us(self, path: str, ts_col: str = "ts") -> int:
        side = path + ".maxts"
        if os.path.exists(side):
            with open(side) as f:
                return int(f.read().strip())
        import pyarrow.compute as pc

        f = self._open(path)
        mx = -(1 << 62)
        for i in range(f.nstripes):
            col = f.read_stripe(i, columns=[ts_col]).column(ts_col)
            if len(col):
                mx = max(mx, pc.max(col.cast(pa.int64())).as_py())
        return mx

    def plan_fragments(self, path: str, target_rows: int) -> list[tuple[int, int, int]]:
        f = self._open(path)
        ns = f.nstripes
        frags: list[tuple[int, int, int]] = []
        lo = off = acc = frag_off = 0
        for s in range(ns):
            n = f.read_stripe(s, columns=["ts"]).num_rows
            acc += n
            off += n
            if acc >= target_rows:
                frags.append((lo, s + 1, frag_off))
                lo, frag_off, acc = s + 1, off, 0
        if lo < ns or not frags:
            frags.append((lo, ns, frag_off))
        return frags

    def read_fragment(self, path: str, lo: int, hi: int | None) -> pa.Table:
        f = self._open(path)
        if hi is None:
            hi = f.nstripes
        batches = [f.read_stripe(i) for i in range(lo, hi)]
        if not batches:
            return f.schema.empty_table()
        t = pa.Table.from_batches(batches)
        ts = t.column("ts")
        if not pa.types.is_timestamp(ts.type):
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts",
                ts.cast(pa.int64()).cast(pa.timestamp("us")),
            )
        return t


SOURCE_DRIVERS = {
    "parquet-stream": ParquetStreamDriver(),
    "jsonl-stream": JsonlStreamDriver(),
    "csv-stream": CsvStreamDriver(),
    "ipc-stream": ArrowIpcStreamDriver(),
    "orc-stream": OrcStreamDriver(),
}


def get_driver(kind: str):
    try:
        return SOURCE_DRIVERS[kind]
    except KeyError:
        raise ValueError(
            f"unknown source kind {kind!r}; registered: {sorted(SOURCE_DRIVERS)}"
        ) from None


SOURCE_REGISTRY = SOURCE_DRIVERS
