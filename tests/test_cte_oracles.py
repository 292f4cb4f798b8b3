"""DuckDB recursive-CTE oracle SQL vs the numpy kernels, without Spark.

The driver's value-level oracles for the DP queries (dtw_daily_pairs,
dtw_ndim_daily_pairs, nw_align, subsequence_topk) replay the exact
recurrences as anti-diagonal recursive CTEs.  These tests run the very
same ORACLES[...] SQL strings on a small synthetic ``events`` table and
compare against the kernels directly — so an edit to the SQL that
drifts from the kernel semantics fails here even before the driver's
Spark-vs-DuckDB gate runs.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.kernels.alignment import needleman_wunsch
from dtaidistance_spark.kernels.dtw import DtwSettings, dtw_distance
from dtaidistance_spark.kernels.subsequence import best_match_value
from dtaidistance_spark.plans.driver_queries import ORACLES


@pytest.fixture(scope="module")
def con():
    """DuckDB with a deterministic synthetic events table: 6 users,
    ragged activity over ~5 days, mixed event types."""
    rng = np.random.default_rng(1234)
    rows = []
    eid = 0
    base = pd.Timestamp("2026-03-01 06:00:00")
    types = ["view", "click", "purchase", "scroll"]
    for uid in range(6):
        n = int(rng.integers(20, 60))
        # cluster each user's events into a user-specific sub-span so the
        # daily grids are ragged before the global alignment
        t0 = base + pd.Timedelta(hours=int(rng.integers(0, 48)))
        offs = np.sort(rng.uniform(0, 3600 * 24 * 3, n))
        for o in offs:
            rows.append((eid, t0 + pd.Timedelta(seconds=float(o)), uid,
                         types[int(rng.integers(0, len(types)))],
                         float(np.round(rng.uniform(0, 50), 3)), "{}"))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    c = duckdb.connect()
    c.register("events_src", pdf)
    c.execute("CREATE TABLE events AS SELECT * FROM events_src")
    return c


def _daily_count_series(con):
    """Global-aligned zero-filled daily count arrays, ordered by the
    'user<id>' string key (mirrors gap_fill align='global' +
    series_arrays + with_index)."""
    pdf = con.execute("""
        WITH agg AS (
          SELECT 'user' || CAST(user_id AS VARCHAR) AS series_id,
                 date_trunc('day', ts) AS d, count(*) AS cnt
          FROM events GROUP BY 1, 2),
        gb AS (SELECT min(d) b0, max(d) b1 FROM agg),
        grid AS (SELECT s.series_id,
                        unnest(generate_series(gb.b0, gb.b1,
                                               interval 1 day)) AS d
                 FROM (SELECT DISTINCT series_id FROM agg) s, gb)
        SELECT g.series_id, g.d, coalesce(a.cnt, 0) AS cnt
        FROM grid g LEFT JOIN agg a
          ON a.series_id = g.series_id AND a.d = g.d
        ORDER BY g.series_id, g.d
    """).df()
    out = {}
    for sid, grp in pdf.groupby("series_id"):
        out[sid] = grp["cnt"].to_numpy(dtype=np.float64)
    return [out[k] for k in sorted(out)]


class TestDtwDailyCte:
    def test_matches_kernel(self, con):
        series = _daily_count_series(con)
        got = {(int(i), int(j)): d for i, j, d in
               con.execute(ORACLES["dtw_daily_pairs"]).fetchall()}
        assert len(got) == len(series) * (len(series) - 1) // 2
        st = DtwSettings()
        for i in range(len(series)):
            for j in range(i + 1, len(series)):
                want = dtw_distance(series[i], series[j], settings=st)
                assert got[(i, j)] == pytest.approx(want, abs=2e-6), (i, j)


class TestNwAlignCte:
    def test_matches_kernel(self, con):
        pattern = ["view", "click", "purchase", "view", "click"]
        seqs = con.execute("""
            SELECT 'user' || CAST(user_id AS VARCHAR) AS series_id,
                   list(event_type ORDER BY ts, event_id)[:48] AS syms
            FROM events GROUP BY 1 ORDER BY 1
        """).fetchall()
        got = dict(con.execute(ORACLES["nw_align"]).fetchall())
        assert len(got) == len(seqs)
        for sid, syms in seqs:
            want, _ = needleman_wunsch(pattern, [str(s) for s in syms])
            assert got[sid] == pytest.approx(round(float(want), 6),
                                             abs=1e-9), sid


class TestSubsequenceTopkCte:
    def test_matches_kernel(self, con):
        # hourly count series on the global grid (the oracle's sv CTE)
        pdf = con.execute("""
            WITH agg AS (
              SELECT 'user' || CAST(user_id AS VARCHAR) AS series_id,
                     date_trunc('hour', ts) AS h, count(*) AS cnt
              FROM events GROUP BY 1, 2),
            gb AS (SELECT min(h) b0, max(h) b1 FROM agg),
            grid AS (SELECT s.series_id,
                            unnest(generate_series(gb.b0, gb.b1,
                                                   interval 1 hour)) AS h
                     FROM (SELECT DISTINCT series_id FROM agg) s, gb)
            SELECT g.series_id, g.h, coalesce(a.cnt, 0) AS cnt
            FROM grid g LEFT JOIN agg a
              ON a.series_id = g.series_id AND a.h = g.h
            ORDER BY g.series_id, g.h
        """).df()
        series = {sid: grp["cnt"].to_numpy(dtype=np.float64)
                  for sid, grp in pdf.groupby("series_id")}
        query = np.concatenate([np.zeros(6), np.linspace(0, 3, 6),
                                np.linspace(3, 0, 6), np.zeros(6)])
        want = sorted(
            ((best_match_value(query, v, penalty=0.1), sid)
             for sid, v in series.items() if len(v) >= 24))[:10]
        got = con.execute(ORACLES["subsequence_topk"]).fetchall()
        assert [sid for sid, _ in got] == [sid for _, sid in want]
        for (sid, mv), (wv, _) in zip(got, want):
            assert mv == pytest.approx(wv, abs=2e-6), sid


class TestKmeansAssignCte:
    def test_matches_kernel(self, con):
        """kmeans E-step twin: argmin DTW to 4 fixed centers with the
        (d, center) tie order of operators/cluster.py::kmeans_assign."""
        series = _daily_count_series(con)
        centers = series[:4]
        got = {int(i): (int(c), d) for i, c, d in
               con.execute(ORACLES["kmeans_assign_step"]).fetchall()}
        assert len(got) == len(series)
        st = DtwSettings()
        for si, s in enumerate(series):
            ds = [dtw_distance(c, s, settings=st) for c in centers]
            want_c = int(np.argmin(ds))
            assert got[si][0] == want_c, si
            assert got[si][1] == pytest.approx(ds[want_c], abs=2e-6), si


class TestLocoBestMatchCte:
    def test_matches_kernel(self, con):
        """LoCo twin: estimation + affinity lattice + argmax + ridge
        traceback vs kernels/loco.py on the synthetic hourly series."""
        from dtaidistance_spark.kernels.loco import LocalConcurrences

        pdf = con.execute("""
            WITH agg AS (
              SELECT 'user' || CAST(user_id AS VARCHAR) AS series_id,
                     date_trunc('hour', ts) AS h, count(*) AS cnt
              FROM events GROUP BY 1, 2),
            gb AS (SELECT min(h) b0, max(h) b1 FROM agg),
            grid AS (SELECT s.series_id,
                            unnest(generate_series(gb.b0, gb.b1,
                                                   interval 1 hour)) AS h
                     FROM (SELECT DISTINCT series_id FROM agg) s, gb)
            SELECT g.series_id, g.h, coalesce(a.cnt, 0) AS cnt
            FROM grid g LEFT JOIN agg a
              ON a.series_id = g.series_id AND a.h = g.h
            ORDER BY g.series_id, g.h
        """).df()
        series = {sid: grp["cnt"].to_numpy(dtype=np.float64)
                  for sid, grp in pdf.groupby("series_id")}
        keys = sorted(sid for sid, v in series.items() if len(v) >= 24)[:4]
        got = {}
        for ia, ib, rank, step, pi, pj, val in \
                con.execute(ORACLES["loco_best_match"]).fetchall():
            got.setdefault((ia, ib, int(rank)), []).append(
                (int(step), int(pi), int(pj), float(val)))
        n_matches = 0
        for a in range(0, len(keys) - 1, 2):
            s1 = series[keys[a]][:100]
            s2 = series[keys[a + 1]][:100]
            lc = LocalConcurrences(s1, s2)
            lc.estimate_settings_from_ssm(rho=0.8)
            lc.align()
            wp = lc._wp.copy()
            matches = list(lc.kbest_matches(k=2, minlen=1, buffer=0))
            for rank in range(2):
                key = (keys[a], keys[a + 1], rank)
                if rank >= len(matches):
                    assert key not in got
                    continue
                n_matches += 1
                m = matches[rank]
                rows = sorted(got[key])
                want = [(step, x, y,
                         round(float(abs(wp[x + 1, y + 1])), 6))
                        for step, (x, y) in enumerate(m["path"])]
                assert [r[:3] for r in rows] == [w[:3] for w in want], key
                for r, w in zip(rows, want):
                    assert r[3] == pytest.approx(w[3], abs=2e-6), (key, r[0])
        # both fixture pairs must exercise the masking step (k=2 found)
        assert n_matches == 4
