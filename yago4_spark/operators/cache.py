"""Session-scoped registry for operator-internal persisted frames.

Operators that persist an intermediate (shingle tables, IVF cell
assignments) register it here instead of calling ``.persist()`` bare, so
long-lived sessions (bench loops, notebooks, the driver harness) can
release executor memory between entry-point calls with
:func:`release_all` — lazy evaluation means an operator cannot unpersist
its own intermediates before the caller has run an action on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    _LIVE.append(df.persist())
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = len(_LIVE)
    while _LIVE:
        _LIVE.pop().unpersist()
    return n
