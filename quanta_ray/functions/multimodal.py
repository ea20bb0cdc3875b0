"""Multimodal (image/audio/video) pipeline plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the direct
heir of the reference's opaque ``Frame.value: bytes`` payload
(``/root/reference/api/proto/v1/frame.proto:37``): the engine moves bytes and
schema; only stages interpret them.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment): ``decode=fake`` produces deterministic features from the bytes
so the Ray-side plumbing — schema, actor-pool stage shape, small batch sizes
for wide binary rows, output layout — is real and tested; ``decode=real``
raises ``NotImplementedError`` until the libs exist.

Scale notes: binary rows are wide → small ``batch_size`` and
``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
pandas well); decode is CPU-heavy → actor pool sized by ``concurrency`` ×
``num_cpus``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..schema import read_parquet_clean as _read_pq

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(256, 4096, size=n)]
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(n), type=pa.int64()),
            pa.array(kinds, type=pa.string()),
            pa.array(payloads, type=pa.binary()),
            pa.array(["application/octet-stream"] * n),
            pa.array(rng.integers(16, 512, size=n).astype("int32"), type=pa.int32()),
            pa.array(rng.integers(16, 512, size=n).astype("int32"), type=pa.int32()),
            pa.array(rng.integers(100, 60000, size=n).astype("int32"), type=pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    ``mode="fake"``: deterministic 16-dim feature from a blake2b digest of
    the payload (schema/plumbing identical to a real embedding model).
    ``mode="real"``: would load the decoder/model here, once per actor.
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        if mode == "real":  # pragma: no cover - no media libs in this env
            raise NotImplementedError(
                "real decode requires PIL/torchaudio/ffmpeg; not available — "
                "use mode='fake' for plumbing tests"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf in batch.column("payload"):
            digest = hashlib.blake2b(buf.as_py(), digest_size=FEATURE_DIM * 4).digest()
            vec = np.frombuffer(digest, dtype=np.uint32).astype(np.float32)
            vec = vec / np.float32(0xFFFFFFFF)
            feats.append(vec)
        feat_arr = pa.array(
            [f.tolist() for f in feats], type=pa.list_(pa.float32(), FEATURE_DIM)
        )
        return pa.Table.from_arrays(
            [
                batch.column("media_id"),
                batch.column("kind"),
                pa.array(
                    [len(b.as_py()) for b in batch.column("payload")], type=pa.int64()
                ),
                feat_arr,
            ],
            names=["media_id", "kind", "payload_bytes", "features"],
        )


class FrameSampler:
    """Video frame-sampling stage shape: 1→N fan-out of (media_id, frame_idx)
    rows; the actual decode is stubbed to deterministic frame offsets."""

    def __init__(self, fps_divisor: int = 10):
        self.fps_divisor = fps_divisor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, off = [], [], []
        for mid, kind, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if kind != "video":
                continue
            n_frames = max(1, dur // (self.fps_divisor * 33))
            for i in range(n_frames):
                ids.append(mid)
                fidx.append(i)
                off.append(i * self.fps_divisor * 33)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(fidx, type=pa.int32()),
                pa.array(off, type=pa.int32()),
            ],
            names=["media_id", "frame_idx", "offset_ms"],
        )


def media_features(table: pa.Table | None = None, concurrency: int = 2) -> pa.Table:
    """End-to-end plumbing pipeline over a media table (fake decode)."""
    t = table if table is not None else synthesize_media_table()
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        batch_size=16,  # wide binary rows → small batches
        concurrency=concurrency,
    )
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    res = pa.concat_tables(tables, promote_options="default").combine_chunks()
    import pyarrow.compute as pc

    return res.take(pc.sort_indices(res, sort_keys=[("media_id", "ascending")]))


def media_from_documents(sf_dir: str) -> rd.Dataset:
    """Project the ``documents`` table into the media schema: payload =
    utf-8 bytes of the text (an opaque blob to every downstream stage),
    kind round-robin by doc_id, metadata derived deterministically from
    n_chars. This is how a real ingest would attach typed metadata to
    opaque media blobs — and it makes the multimodal stages exercise
    driver data at every scale factor without decode libraries."""
    import pyarrow.compute as pc

    def project(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        ids = did.to_numpy()
        kinds = np.array(["image", "audio", "video"], dtype=object)[ids % 3]
        nchars = batch.column("n_chars").to_numpy()
        return pa.Table.from_arrays(
            [
                did,
                pa.array(kinds, type=pa.string()),
                pc.cast(batch.column("text"), pa.binary()),
                pa.array(["application/octet-stream"] * batch.num_rows),
                pa.array((nchars % 512 + 16).astype("int32"), type=pa.int32()),
                pa.array((nchars % 384 + 16).astype("int32"), type=pa.int32()),
                pa.array((nchars * 37 % 60000 + 100).astype("int32"), type=pa.int32()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).map_batches(project, batch_format="pyarrow", batch_size=1024)


def doc_media_features(sf_dir: str) -> pa.Table:
    """Feature extraction (fake decode) over document-derived media."""
    import pyarrow.compute as pc

    out = media_from_documents(sf_dir).map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    res = pa.concat_tables(tables, promote_options="default").combine_chunks()
    return res.take(pc.sort_indices(res, sort_keys=[("media_id", "ascending")]))


def doc_frame_samples(sf_dir: str) -> pa.Table:
    """Frame-sampling fan-out (1→N) over the 'video' documents."""
    import pyarrow.compute as pc

    out = media_from_documents(sf_dir).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=2
    )
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    res = pa.concat_tables(tables, promote_options="default").combine_chunks()
    return res.take(
        pc.sort_indices(
            res, sort_keys=[("media_id", "ascending"), ("frame_idx", "ascending")]
        )
    )
