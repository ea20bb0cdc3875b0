"""Calm-window watcher for the CLEAN full bench (same physics probe as
``scaling_watch.py``): poll host contention with a deterministic integer
burn at 1 and 32 processes; when the 32-wide per-core efficiency is near
the machine's ~0.83 ceiling, run ``python bench.py`` once and save the
JSON line to ``$QUANTA_WATCH_DIR/clean_attempt_<n>.json``. Stops when an
attempt's headline beats ``TARGET_HEADLINE_S`` (calm-window class) or
after ``MAX_ATTEMPTS``.

Usage: python scripts/clean_bench_watch.py [max_attempts] [target_headline_s]
"""
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("QUANTA_WATCH_DIR", "/tmp/clean_bench_watch")
N = 20_000_000


def burn(n):
    x = 0
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def eff32():
    t0 = time.perf_counter(); burn(N); single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ProcessPoolExecutor(32) as ex:
        list(ex.map(burn, [N] * 32))
    return single / (time.perf_counter() - t0)


def main():
    max_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 6.5
    os.makedirs(OUT, exist_ok=True)
    log = open(os.path.join(OUT, "watch.log"), "a")

    def say(msg):
        print(msg, flush=True)
        log.write(msg + "\n"); log.flush()

    attempt = 0
    while attempt < max_attempts:
        e = eff32()
        say(f"probe eff32={e:.3f}")
        if e < 0.70:
            time.sleep(120)
            continue
        attempt += 1
        say(f"attempt {attempt}: launching clean bench (eff32={e:.3f})")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        path = os.path.join(OUT, f"clean_attempt_{attempt}.json")
        with open(path, "w") as f:
            f.write(line + "\n")
        try:
            d = json.loads(line)
            head = d.get("value")
            say(f"attempt {attempt}: headline={head}s busy={d.get('reduce_busy_sec')}"
                f" -> {path}")
            if head is not None and head <= target:
                say("target met; stopping")
                return
        except Exception as ex:  # noqa: BLE001 - log and keep watching
            say(f"attempt {attempt}: parse error {ex}; stderr tail: "
                + r.stderr[-300:])
        time.sleep(60)
    say("max attempts reached")


if __name__ == "__main__":
    main()
