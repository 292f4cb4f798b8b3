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

Scoping (ADVICE r3): entries are keyed by the owning SparkSession, so
releasing one session's resources cannot destroy broadcasts embedded in
a different session's still-unexecuted plan.  Broadcast handles are held
through *weak* references — a library user who never calls
:func:`release_all` keeps Spark's normal lifecycle: once their last
reference drops, the JVM handle is released and ContextCleaner reclaims
the broadcast.  Persisted DataFrames are held strongly on purpose: a
cached plan whose Python handle was GC'd would otherwise leave an
unpersistable JVM cache entry behind, which is exactly the residue this
registry exists to free.

Contract: operators register via :func:`track_persist` /
:func:`track_broadcast`; harnesses that run multiple independent queries
in one session (bench.py, scripts) call :func:`release_all` after each
query has fully executed.  Releasing is only safe at that point — Spark
recomputes an unpersisted DataFrame if it is re-executed, but a
destroyed broadcast inside a still-pending lazy plan of the same session
fails permanently at execution, so do not call :func:`release_all` while
a tracked plan is awaiting execution.
"""

from __future__ import annotations

import weakref
from typing import Any, Dict, List, Optional

# session-key → strong refs to persisted DataFrames / weakrefs to Broadcasts
_DFS: Dict[str, List[Any]] = {}
_BCS: Dict[str, List[Any]] = {}


def _session_key(df=None) -> str:
    if df is not None:
        try:
            return str(id(df.sparkSession))
        except Exception:
            pass
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            return str(id(active))
    except Exception:
        pass
    return "<no-session>"


def track_persist(df):
    """Register a persisted DataFrame for later release; returns it."""
    _DFS.setdefault(_session_key(df), []).append(df)
    return df


def track_broadcast(bc):
    """Register a Python Broadcast handle for later release; returns it."""
    _BCS.setdefault(_session_key(), []).append(weakref.ref(bc))
    return bc


def release_all(session=None) -> None:
    """Unpersist every tracked DataFrame and destroy every tracked
    broadcast of the given (default: active) session.  Broadcast entries
    whose handle was already garbage-collected are simply dropped (the
    ContextCleaner owns them); errors are ignored (a stopped session /
    already-released handle is fine)."""
    key = str(id(session)) if session is not None else _session_key()
    for df in _DFS.pop(key, []):
        try:
            df.unpersist()
        except Exception:
            pass
    for ref in _BCS.pop(key, []):
        bc = ref()
        if bc is None:
            continue
        try:
            bc.destroy()
        except Exception:
            pass
