"""Mergeable session-duration histogram sketch — shared spec functions.

The running-quantile stream's estimate must be bit-identical between the
distributed engine (runner commit fold) and the single-threaded oracle, so
both import THIS function rather than re-implementing the interpolation.

Sketch: fixed-bin integer histogram of durations (bin = duration //
bin_us, clipped to the top bin). Merge = vector add. Estimate for quantile
``q`` = upper edge of the smallest bin whose cumulative count reaches
``ceil(q * total)`` (fixed-point ceil — no float comparison fuzz).
"""

from __future__ import annotations


def quantile_rows(
    counts: list[int], quantiles: tuple[float, ...], bin_us: int
) -> list[tuple[float, int]]:
    """(q, est_duration_us) per requested quantile, q-ascending.
    ``counts`` must have >= 1 nonzero entry."""
    total = sum(counts)
    out: list[tuple[float, int]] = []
    cum = 0
    b = -1
    for q in sorted(quantiles):
        target = -(-int(q * total * 1_000_000) // 1_000_000)  # fixed-point ceil
        target = max(1, min(total, target))
        while cum < target:
            b += 1
            cum += counts[b]
        out.append((q, (b + 1) * bin_us))
    return out
