"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship streaming CEP pipeline (transcript-shaped
stream → windows/join/exactly-once sink) on sf0.001-derived data.
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
callable over an sf dir; ``oracle_sql()`` gives the DuckDB-checkable subset.
Both delegate to ``quanta_ray.registry`` (the library-side home of the
surface, also served by ``python -m quanta_ray query``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: events@sf0.001 → transcript stream → streaming CEP engine →
    tumbling-window table (exactly-once committed output)."""
    from quanta_ray.pipelines import flagship

    work = tempfile.mkdtemp(prefix="quanta-entry-", dir="/tmp")
    try:
        res = flagship.run_flagship_on_events("/root/testdata/sf0.001", work)
        out = flagship.flagship_outputs(res["out_dir"])
        t = out["tumbling"]
        return t.to_pandas() if t is not None else __import__("pandas").DataFrame()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from quanta_ray import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from quanta_ray import registry

    return registry.oracle_sql()
