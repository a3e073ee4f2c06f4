"""Tracked ``persist()`` handles for iterative operators.

Operators like the kNN ring expansion and the MinHash-LSH self-join
persist intermediates that the *returned* (still lazy) DataFrame's
lineage references — they cannot be unpersisted inside the operator.
Instead each handle is tracked here, and every operator entry point
calls :func:`release_all` first, so a session running many queries
back-to-back (the driver's 47-query suite, repeated bench iterations)
never accumulates more than one operator's worth of cached blocks in
executor storage memory.

Unpersisting a block that an earlier, never-materialized DataFrame
still references is safe: Spark recomputes from lineage — persist is
an optimization, never a correctness dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register the handle for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked handle (non-blocking)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
