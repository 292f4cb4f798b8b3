"""End-to-end tests of the resumable corpus-curation pipeline
(scripts/curate_corpus.py): stage chaining, resume idempotence, and
fingerprint-driven selective recompute."""

import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(spark, workdir, extra=()):
    sys.path.insert(0, SCRIPTS)
    try:
        import curate_corpus
    finally:
        sys.path.pop(0)
    argv = ["--input", DOCS, "--workdir", str(workdir), *extra]
    # main() builds its own session only when none is active; the
    # pytest session fixture is active, so it is reused.
    return curate_corpus.main(argv)


@pytest.mark.skipif(not os.path.exists(DOCS), reason="testdata absent")
class TestCurationPipeline:
    def test_stages_shrink_monotonically_and_resume(self, spark, tmp_path):
        wd = tmp_path / "curate"
        m1 = _run(spark, wd)
        s = m1["stages"]
        order = ["pii", "quality", "exact", "spans", "neardup",
                 "decontam", "ppl", "split"]
        rows = [s[name]["rows"] for name in order]
        assert rows == sorted(rows, reverse=True)  # each stage only drops
        assert s["mix"]["rows"] <= s["split"]["rows"]
        assert s["pack"]["rows"] == s["mix"]["rows"]  # pack adds columns
        assert not any(st["resumed"] for st in s.values())
        assert set(m1["final"]) == {"train", "val", "test"}
        assert sum(m1["final"].values()) == s["pack"]["rows"]

        # second run: every stage resumes from its manifest, output
        # checksum identical (per-partition lineage proves same data)
        m2 = _run(spark, wd)
        assert all(st["resumed"] for st in m2["stages"].values())
        assert m2["final_checksum"] == m1["final_checksum"]
        assert m2["final"] == m1["final"]

    def test_param_change_recomputes_only_downstream(self, spark, tmp_path):
        wd = tmp_path / "curate"
        _run(spark, wd)
        # tighten the decontamination knob: stages 1-3 must resume,
        # 4-6 must recompute (fingerprint chaining)
        m = _run(spark, wd, extra=("--min-overlap", "2"))
        s = m["stages"]
        assert s["pii"]["resumed"] and s["quality"]["resumed"] \
            and s["exact"]["resumed"] \
            and s["spans"]["resumed"] and s["neardup"]["resumed"]
        assert not s["decontam"]["resumed"] and not s["ppl"]["resumed"] \
            and not s["split"]["resumed"] \
            and not s["mix"]["resumed"] and not s["pack"]["resumed"]
        # stricter overlap cut can only drop more docs
        assert s["decontam"]["rows"] <= s["neardup"]["rows"]


class TestRepeatedSpans:
    """Exact repeated-substring spans (hash-window suffix-array
    relaxation, operators/dedup.py::repeated_spans; the driver query
    `dup_spans` carries the full gaps-and-islands DuckDB twin)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "a b c d e f g h i j unique1 tail one"),
             (2, "prefix two a b c d e f g h i j other"),
             (3, "z z z z z z z z z z z z"),       # within-doc repeat
             (4, "totally different words with no repeats here at all"),
             (5, "short doc")],                    # < k tokens: no rows
            "doc_id long, text string")

    def test_known_spans(self, spark):
        from dtaidistance_spark.operators.dedup import repeated_spans

        out = repeated_spans(self._docs(spark), k=8, min_count=2) \
            .orderBy("doc_id", "span_start").collect()
        got = [(r.doc_id, r.span_start, r.span_end, r.n_windows)
               for r in out]
        # docs 1/2 share the 10-token run "a b … j" (3 hot windows,
        # merged into one maximal span at each doc's own offset);
        # doc 3 repeats its single all-z window at every position
        assert got == [(1, 0, 10, 3), (2, 2, 12, 3), (3, 0, 12, 5)]

    def test_islands_split_on_gap(self, spark):
        from dtaidistance_spark.operators.dedup import repeated_spans

        # two disjoint repeated runs inside one doc pair -> two spans
        run1 = "a b c d e f g h"
        run2 = "p q r s t u v w"
        docs = spark.createDataFrame(
            [(1, f"{run1} xx yy zz qq {run2}"),
             (2, f"one {run1} mid gap words {run2} two")],
            "doc_id long, text string")
        out = repeated_spans(docs, k=8, min_count=2) \
            .orderBy("doc_id", "span_start").collect()
        spans = [(r.doc_id, r.span_start, r.span_end) for r in out]
        assert spans == [(1, 0, 8), (1, 12, 20),
                         (2, 1, 9), (2, 12, 20)]

    def test_hot_set_broadcast_plan(self, spark):
        from dtaidistance_spark.operators.dedup import repeated_spans

        plan = repeated_spans(self._docs(spark))._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        plan2 = repeated_spans(self._docs(spark), broadcast_hot=False) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2.split("AdaptiveSparkPlan")[0] \
            or "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2

    def test_remove_spans_cuts_exact_tokens(self, spark):
        from dtaidistance_spark.operators.dedup import (remove_spans,
                                                        repeated_spans)

        docs = self._docs(spark)
        spans = repeated_spans(docs, k=8, min_count=2)
        out = {r.doc_id: r for r in remove_spans(docs, spans).collect()}
        assert out[1].clean_text == "unique1 tail one"
        assert (out[1].n_tokens, out[1].n_removed) == (13, 10)
        assert out[2].clean_text == "prefix two other"
        assert out[3].clean_text == "" and out[3].n_removed == 12
        # span-free docs pass through with the normalized text intact
        assert out[4].n_removed == 0
        assert out[4].clean_text == \
            "totally different words with no repeats here at all"
        assert out[5].clean_text == "short doc"
