"""Session-scoped registry of lazily-held resources (persisted DataFrames,
Python-side ``sc.broadcast`` handles).

Operators that build *lazy* plans (``distance_matrix``, ``search_topk``,
``with_index``) must persist intermediates or broadcast the corpus while
the returned DataFrame is still unevaluated — they cannot unpersist on
return, because the resource is consumed only when the caller finally
executes the plan.  ``spark.catalog.clearCache()`` frees cached
DataFrames but NOT Python ``Broadcast`` handles (those need an explicit
``destroy()``), so a long-lived session that runs many queries
accumulates executor/driver state and every later query measures the
residue, not the plan (round-2 lesson: the DTW matrix benched 3× slower
in-suite than standalone).

Contract: operators register via :func:`track_persist` /
:func:`track_broadcast`; harnesses that run multiple independent queries
in one session (bench.py, scripts) call :func:`release_all` after each
query has fully executed.  Releasing is safe at that point — Spark
recomputes an unpersisted DataFrame if it is ever re-executed, and a
destroyed broadcast is never touched again once its consuming query
finished.
"""

from __future__ import annotations

from typing import Any, List

_DFS: List[Any] = []
_BCS: List[Any] = []


def track_persist(df):
    """Register a persisted DataFrame for later release; returns it."""
    _DFS.append(df)
    return df


def track_broadcast(bc):
    """Register a Python Broadcast handle for later release; returns it."""
    _BCS.append(bc)
    return bc


def release_all() -> None:
    """Unpersist every tracked DataFrame and destroy every tracked
    broadcast.  Errors are ignored (a stopped session / already-released
    handle is fine)."""
    while _DFS:
        df = _DFS.pop()
        try:
            df.unpersist()
        except Exception:
            pass
    while _BCS:
        bc = _BCS.pop()
        try:
            bc.destroy()
        except Exception:
            pass
