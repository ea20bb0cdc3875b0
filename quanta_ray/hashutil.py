"""Shared vectorized hashing helpers.

``md5_hex`` is the ONE implementation of the try-DuckDB-kernel /
except-hashlib-loop idiom (previously copied in ``pipelines/batch_cep.py``
and twice in ``functions/curation.py``): md5 hexdigests computed through
DuckDB's C-vectorized ``md5()`` kernel over a whole Arrow column (zero-copy
in/out, order-preserving for a single-table projection), falling back to a
plain hashlib loop only when duckdb is absent. md5 (not the cheaper
``pd.util.hash_array``) is used wherever a DuckDB SQL oracle's ``ORDER BY
md5(...)`` / split-assignment must reproduce bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def md5_hex(vals) -> np.ndarray:
    """md5 hexdigest (32-char str) per value, matching SQL
    ``md5(CAST(v AS VARCHAR))`` for integer and string inputs."""
    arr = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) else pa.array(vals)
    try:
        import duckdb

        t = pa.table({"v": arr})
        return (
            duckdb.sql("SELECT md5(CAST(v AS VARCHAR)) AS k FROM t")
            .arrow()
            .column("k")
            .to_numpy(zero_copy_only=False)
        )
    except ImportError:  # pragma: no cover - duckdb is baked into this env
        import hashlib

        return np.array(
            [hashlib.md5(str(v).encode()).hexdigest() for v in arr.to_pylist()],
            dtype=object,
        )
