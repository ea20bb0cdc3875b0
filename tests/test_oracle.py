"""Oracle interpreter sanity on a hand-built micro-stream with hand-computed
expectations — the oracle is the spec, so pin it independently."""

import pyarrow as pa

from quanta_ray.config import CEPConfig, US
from quanta_ray.oracle import run_oracle

BASE = 1_700_000_000_000_000  # epoch-us


def _t(rows):
    return pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
            "role": [r[2] for r in rows],
            "text": [r[3] for r in rows],
            "tool": [r[4] for r in rows],
            "ts": pa.array([BASE + r[5] * US for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


CFG = CEPConfig(
    allowed_lateness_us=60 * US,
    tumbling_size_us=600 * US,
    sliding_size_us=600 * US,
    sliding_slide_us=300 * US,
    session_gap_us=120 * US,
    join_bound_us=300 * US,
)


def test_tumbling_emission_timing_and_late_drop():
    # epoch 0: two turns at t=0,10 → wm = 10-60 < 0, nothing closes
    # epoch 1: turn at t=700 → wm = 640 ≥ window [0,600) end → emit
    #          + a late row at t=-100 (< wm_0 = -50) → dropped
    e0 = _t([("c", 0, "user", "a", "", 0), ("c", 1, "assistant", "b", "", 10)])
    e1 = _t([("c", 2, "user", "c", "", 700), ("c", 3, "user", "late", "", -100)])
    out = run_oracle([e0, e1], CFG.replace(final_flush=False))
    assert out["metrics"]["n_late_dropped"] == 1
    tum = out["tumbling"].to_pylist()
    assert len(tum) == 1
    w = tum[0]
    assert w["n_turns"] == 2 and w["n_user"] == 1 and w["n_assistant"] == 1
    assert w["first_text"] == "a" and w["last_text"] == "b"


def test_final_flush_emits_open_windows():
    e0 = _t([("c", 0, "user", "a", "", 0)])
    out = run_oracle([e0], CFG)  # final_flush=True
    assert out["tumbling"].num_rows == 1
    assert out["sessions"].num_rows == 1
    # sliding: t=0 belongs to windows starting at -300 and 0
    assert out["sliding"].num_rows == 2


def test_session_split_on_gap():
    # gap=120s: turns at 0, 100, 400 → sessions {0,100} and {400}
    e0 = _t(
        [
            ("c", 0, "user", "a", "", 0),
            ("c", 1, "assistant", "b", "", 100),
            ("c", 2, "user", "c", "", 400),
        ]
    )
    out = run_oracle([e0], CFG)
    sess = out["sessions"].to_pylist()
    assert [s["n_turns"] for s in sess] == [2, 1]
    assert sess[0]["session_id"] == 0 and sess[1]["session_id"] == 1
    assert sess[0]["first_text"] == "a" and sess[0]["last_text"] == "b"


def test_join_matches_next_assistant_within_bound():
    e0 = _t(
        [
            ("c", 0, "user", "q", "", 0),
            ("c", 1, "tool", "t1", "bash", 10),
            ("c", 2, "assistant", "a1", "", 20),
            ("c", 3, "tool", "t2", "read", 30),  # next assistant out of bound
            ("c", 4, "assistant", "a2", "", 400),
        ]
    )
    out = run_oracle([e0], CFG)
    joins = {j["tool_turn_idx"]: j for j in out["joins"].to_pylist()}
    assert joins[1]["matched"] and joins[1]["assistant_text"] == "a1"
    # bound=300: t2 at 30 → a2 at 400 is outside [30, 330] → unmatched
    assert not joins[3]["matched"] and joins[3]["assistant_text"] is None


def test_join_requires_later_turn_idx():
    # assistant earlier in turn order never matches, even if ts is in bound
    e0 = _t(
        [
            ("c", 0, "assistant", "a0", "", 5),
            ("c", 1, "tool", "t", "bash", 10),
        ]
    )
    out = run_oracle([e0], CFG)
    j = out["joins"].to_pylist()[0]
    assert not j["matched"]
