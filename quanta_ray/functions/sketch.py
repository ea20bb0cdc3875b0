"""Mergeable streaming sketches — the approximate operators a 100-TB
pipeline reaches for when the exact answer needs a shuffle it can't afford.

Both sketches here are ORDER-INSENSITIVE and mergeable by an elementwise
reduction, so the distributed shape is the cheapest one possible: one
streaming pass emits a fixed-size partial per batch (never a row per input
record), and the driver folds O(registers) integers — no groupby, no sort,
no all-to-all at any corpus size. Determinism comes from a fixed integer
hash (splitmix64), so the same input gives the bit-same estimate at every
shard count (pinned by the shard-invariance tests).

- ``hll_distinct``: HyperLogLog (Flajolet et al. 2007) distinct-count per
  group. 2^p registers per group; merge = elementwise max — the exact
  semantics of a union of observed sets. Standard error ~1.04/sqrt(2^p)
  (~1.6% at p=12); the small-range linear-counting correction is applied
  exactly as the paper's V>0 branch.
- ``cms_heavy_hitters``: Count-Min (Cormode & Muthukrishnan 2005) heavy
  hitters. d hash rows x w counters; merge = elementwise sum (fully
  commutative). Point estimate = min over rows; never an undercount,
  overcount <= e*N/w with probability 1-(1/2)^d... the classic one-sided
  bound the pytest pins. Candidate top-k is recovered from a per-batch
  exact-local-counts partial capped at ``cand_cap`` ids (heavy hitters are
  heavy in some batch; cap documented) and re-estimated through the merged
  sketch.

Reference scope note: the reference engine (a streaming CEP runner,
/root/reference/internal/pipeline/runner.go) has no sketch operators; these
belong to the north-rule's large-scale-training-data surface, next to the
exact counterparts already in tree (``ev_topk_users`` exact top-k,
``ev_rolling_wau`` exact distinct) so a user can choose exact-with-shuffle
or approximate-one-pass per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schema import from_pandas as _from_pandas, read_parquet_clean as _read_pq


def _events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/events.parquet", columns=columns)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (SplitMix64 finalizer) — vectorized, no
    Python loop; the sketch hash everywhere in this module."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# --- HyperLogLog ----------------------------------------------------------------


def _hll_partial(uids: np.ndarray, p: int) -> np.ndarray:
    """2^p uint8 registers for one value array (rho = leading-zero rank of
    the hash suffix, register indexed by the hash prefix)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(uids) == 0:
        return regs
    h = _splitmix64(uids)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h << np.uint64(p)  # top 64-p bits of the suffix, left-aligned
    # rho = 1 + count of leading zeros in the (64-p)-bit suffix, capped
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = suffix.copy()
    # vectorized CLZ via binary probing (6 steps for 64 bits)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint8(shift)
        cur[mask] = cur[mask] << np.uint64(shift)
    rho = np.minimum(lz, 64 - p).astype(np.uint8) + np.uint8(1)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate + the paper's small-range linear-counting branch."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return est


def hll_distinct(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate distinct ``user_id`` per ``event_type`` via HyperLogLog.

    Shape: one streaming pass; each batch emits ONE partial row per group
    seen in the batch carrying its 2^p-register array (fixed size — never
    per-input-row). The driver folds elementwise max per group: O(groups x
    2^p) bytes of driver state, zero shuffle. Estimates are deterministic
    (fixed splitmix64 hash) and shard-count-invariant (register max is
    commutative/idempotent) — both pinned. Error bound vs the exact
    distinct is pinned at 3 sigma (~4.9% at p=12)."""
    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out_g, out_r = [], []
        uid = batch["user_id"].to_numpy(np.int64).astype(np.uint64)
        et = batch["event_type"].to_numpy(dtype=object)
        for g in pd.unique(et):
            out_g.append(g)
            out_r.append(_hll_partial(uid[et == g], p).tobytes())
        return pd.DataFrame({"event_type": out_g, "regs": out_r})

    parts = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    merged: dict[str, np.ndarray] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for g, rb in zip(b["event_type"], b["regs"]):
            regs = np.frombuffer(rb, dtype=np.uint8)
            if g in merged:
                np.maximum(merged[g], regs, out=merged[g])
            else:
                merged[g] = regs.copy()
    rows = sorted(
        (g, int(round(_hll_estimate(r))), m) for g, r in merged.items()
    )
    df = pd.DataFrame(rows, columns=["event_type", "est_distinct", "registers"])
    return _from_pandas(df)


# --- Count-Min heavy hitters ----------------------------------------------------

_CMS_SALTS = (0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0,
              0x082EFA98EC4E6C89)  # pi digits; one fixed salt per hash row


def cms_heavy_hitters(
    sf_dir: str, k: int = 10, w: int = 2048, cand_cap: int = 256
) -> pa.Table:
    """Top-k ``user_id`` by estimated event count via a Count-Min sketch.

    Shape: one streaming pass; each batch emits (a) its d x w counter
    partial (merge = elementwise SUM — fully commutative, so shard-count
    invariant) and (b) its ``cand_cap`` locally-heaviest ids (a true global
    heavy hitter is heavy in some batch; the cap is the documented
    approximation knob, like every candidate-generation stage in tree).
    The driver folds O(d*w) ints + a bounded candidate set, re-estimates
    candidates through the merged sketch (min over rows -> never an
    undercount), and returns the top-k by (est desc, user_id). Pins: no
    undercount, overcount <= 3*N/w, and every true top-k id present."""
    d = len(_CMS_SALTS)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy(np.int64).astype(np.uint64)
        table = np.zeros((d, w), dtype=np.int64)
        for r, salt in enumerate(_CMS_SALTS):
            idx = (_splitmix64(uid ^ np.uint64(salt)) % np.uint64(w)).astype(
                np.int64
            )
            np.add.at(table[r], idx, 1)
        vals, counts = np.unique(uid, return_counts=True)
        top = np.argsort(-counts, kind="stable")[:cand_cap]
        return pd.DataFrame(
            {
                "sketch": [table.tobytes()],
                "cands": [vals[top].astype(np.int64).tobytes()],
            }
        )

    parts = _events(sf_dir, ["user_id"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    merged = np.zeros((d, w), dtype=np.int64)
    cands: set[int] = set()
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for sb, cb in zip(b["sketch"], b["cands"]):
            merged += np.frombuffer(sb, dtype=np.int64).reshape(d, w)
            cands.update(np.frombuffer(cb, dtype=np.int64).tolist())
    if not cands:
        return _from_pandas(
            pd.DataFrame(columns=["user_id", "est_count"]).astype(
                {"user_id": np.int64, "est_count": np.int64}
            )
        )
    cand_arr = np.fromiter(sorted(cands), dtype=np.int64)
    u = cand_arr.astype(np.uint64)
    ests = np.full(len(cand_arr), np.iinfo(np.int64).max, dtype=np.int64)
    for r, salt in enumerate(_CMS_SALTS):
        idx = (_splitmix64(u ^ np.uint64(salt)) % np.uint64(w)).astype(np.int64)
        np.minimum(ests, merged[r][idx], out=ests)
    order = np.lexsort((cand_arr, -ests))[:k]
    df = pd.DataFrame(
        {"user_id": cand_arr[order], "est_count": ests[order]}
    )
    return _from_pandas(df)
