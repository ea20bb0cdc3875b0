"""Flow-control/commit machinery tests (reference F2/F4 semantics,
``/root/reference/source/kafka/checkpoint.go``)."""

import os

from quanta_ray.state import (
    CommitThrottle,
    LowWatermarkTracker,
    latest_committed_epoch,
    read_manifest,
    write_manifest,
)


def test_contiguous_prefix_commit():
    # checkpoint.go:11-62 — out-of-order resolution commits only the prefix
    t = LowWatermarkTracker()
    seqs = [t.track() for _ in range(5)]
    assert t.highest() == -1
    t.resolve(seqs[2])
    assert t.highest() == -1  # 0 and 1 still pending
    t.resolve(seqs[0])
    assert t.highest() == 0
    t.resolve(seqs[1])
    assert t.highest() == 2  # merged forward through resolved 2
    t.resolve(seqs[4])
    assert t.highest() == 2
    t.resolve(seqs[3])
    assert t.highest() == 4
    assert t.pending() == 0


def test_commit_throttle():
    # checkpoint.go:108-135 — at most one commit per interval (injected clock)
    th = CommitThrottle(5.0)
    assert th.should_commit(0.0)
    assert not th.should_commit(3.0)
    assert th.should_commit(5.0)
    assert not th.should_commit(9.9)
    assert th.should_commit(10.0)


def test_manifest_atomicity_and_latest(tmp_path):
    d = str(tmp_path)
    assert latest_committed_epoch(d) == -1
    write_manifest(d, 0, {"files": [], "checkpoints": []})
    write_manifest(d, 1, {"files": [{"stream": "turns", "path": "x"}], "checkpoints": []})
    assert latest_committed_epoch(d) == 1
    m = read_manifest(d, 1)
    assert m["epoch"] == 1 and m["files"][0]["stream"] == "turns"
    # no stray temp files after atomic writes
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]


def test_window_state_merge_matches_bruteforce():
    """The sorted-merge columnar window state must equal a dict-based
    reference under many randomized merge/pop rounds (counts summed,
    first/last = (ts, turn)-min/max, watermark pops)."""
    import numpy as np

    from quanta_ray.engine.worker import _WindowState

    rng = np.random.default_rng(41)
    ws = _WindowState()
    ref: dict = {}
    Q = 10
    for round_ in range(30):
        g = int(rng.integers(1, 40))
        code = rng.integers(0, 12, g)
        w = rng.integers(-5, 15, g) * Q
        n = rng.integers(1, 5, g)
        nu = rng.integers(0, 3, g)
        na = rng.integers(0, 3, g)
        nt = rng.integers(0, 3, g)
        f_ts = rng.integers(0, 1000, g)
        f_turn = rng.integers(0, 50, g)
        l_ts = f_ts + rng.integers(0, 100, g)
        l_turn = rng.integers(0, 50, g)
        f_text = np.array([f"f{round_}-{i}" for i in range(g)], dtype=object)
        l_text = np.array([f"l{round_}-{i}" for i in range(g)], dtype=object)
        ws.merge(code, w, n, nu, na, nt, f_ts, f_turn, f_text, l_ts, l_turn, l_text, quantum=Q)
        for i in range(g):
            k = (int(code[i]), int(w[i]))
            cur = ref.get(k)
            part = [int(n[i]), int(nu[i]), int(na[i]), int(nt[i]),
                    (int(f_ts[i]), int(f_turn[i]), f_text[i]),
                    (int(l_ts[i]), int(l_turn[i]), l_text[i])]
            if cur is None:
                ref[k] = part
            else:
                cur[0] += part[0]; cur[1] += part[1]; cur[2] += part[2]; cur[3] += part[3]
                if part[4][:2] < cur[4][:2]:
                    cur[4] = part[4]
                if part[5][:2] > cur[5][:2]:
                    cur[5] = part[5]
        if round_ % 7 == 3:
            wm = int(rng.integers(-40, 160))
            popped = ws.pop_closed(Q, wm)
            pop_ref = {k: v for k, v in ref.items() if k[1] + Q <= wm}
            for k in pop_ref:
                del ref[k]
            got = {}
            if popped is not None:
                pc_, pw_, pn_, pnu_, pna_, pnt_, pf_ts_, pf_text_, pl_ts_, pl_text_ = popped
                for i in range(len(pc_)):
                    got[(int(pc_[i]), int(pw_[i]))] = (
                        int(pn_[i]), int(pnu_[i]), int(pna_[i]), int(pnt_[i]),
                        int(pf_ts_[i]), pf_text_[i], int(pl_ts_[i]), pl_text_[i],
                    )
            want = {k: (v[0], v[1], v[2], v[3], v[4][0], v[4][2], v[5][0], v[5][2])
                    for k, v in pop_ref.items()}
            assert got == want, f"round {round_}"
    # final flush compares remaining state
    popped = ws.pop_closed(Q, 1 << 40)
    got = {}
    if popped is not None:
        pc_, pw_, pn_, pnu_, pna_, pnt_, pf_ts_, pf_text_, pl_ts_, pl_text_ = popped
        for i in range(len(pc_)):
            got[(int(pc_[i]), int(pw_[i]))] = (
                int(pn_[i]), int(pnu_[i]), int(pna_[i]), int(pnt_[i]),
                int(pf_ts_[i]), pf_text_[i], int(pl_ts_[i]), pl_text_[i],
            )
    want = {k: (v[0], v[1], v[2], v[3], v[4][0], v[4][2], v[5][0], v[5][2])
            for k, v in ref.items()}
    assert got == want


def test_session_state_merge_matches_bruteforce():
    """The segmented-sweep session merge must equal a brute-force interval
    union (gap-bridged, transitive) under randomized rounds."""
    import numpy as np

    from quanta_ray.engine.worker import _SessionState

    GAP = 10
    rng = np.random.default_rng(23)
    ss = _SessionState()
    ref: dict[int, list] = {}  # code -> list of [s_ts, s_turn, s_text, e_ts, e_turn, e_text, n]

    def ref_insert(code, s_ts, s_turn, s_text, e_ts, e_turn, e_text, n):
        iv = [s_ts, s_turn, s_text, e_ts, e_turn, e_text, n]
        lst = ref.setdefault(code, [])
        lst.append(iv)
        # re-merge the whole list (brute force): sort by start, sweep
        lst.sort(key=lambda v: (v[0], v[1]))
        out = [lst[0]]
        for v in lst[1:]:
            cur = out[-1]
            if v[0] <= cur[3] + GAP:
                if (v[0], v[1]) < (cur[0], cur[1]):
                    cur[0], cur[1], cur[2] = v[0], v[1], v[2]
                if (v[3], v[4]) > (cur[3], cur[4]):
                    cur[3], cur[4], cur[5] = v[3], v[4], v[5]
                cur[6] += v[6]
            else:
                out.append(v)
        ref[code] = out

    for round_ in range(40):
        g = int(rng.integers(1, 25))
        code = rng.integers(0, 8, g)
        s_ts = rng.integers(0, 300, g)
        dur = rng.integers(0, 15, g)
        e_ts = s_ts + dur
        # (ts, turn) keys are unique in real transcripts (turn_idx unique per
        # conv) — unique turns here keep boundary tie-breaks deterministic
        s_turn = np.arange(g) * 2 + round_ * 1000
        e_turn = np.arange(g) * 2 + 1 + round_ * 1000
        n = rng.integers(1, 6, g)
        s_text = np.array([f"s{round_}-{i}" for i in range(g)], dtype=object)
        e_text = np.array([f"e{round_}-{i}" for i in range(g)], dtype=object)
        ss.merge(
            (code, s_ts, s_turn.astype(np.int64), s_text,
             e_ts, e_turn.astype(np.int64), e_text, n.astype(np.int64)),
            GAP,
        )
        for i in range(g):
            ref_insert(int(code[i]), int(s_ts[i]), int(s_turn[i]), s_text[i],
                       int(e_ts[i]), int(e_turn[i]), e_text[i], int(n[i]))
        # compare full state every few rounds
        if round_ % 5 == 4:
            got = {}
            for i in range(len(ss.code)):
                got.setdefault(int(ss.code[i]), []).append(
                    (int(ss.s_ts[i]), ss.s_text[i], int(ss.e_ts[i]), ss.e_text[i], int(ss.n[i]))
                )
            want = {c: [(v[0], v[2], v[3], v[5], v[6]) for v in lst] for c, lst in ref.items()}
            assert got == want, f"round {round_}"
