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
        order = ["quality", "exact", "neardup", "decontam", "split"]
        rows = [s[name]["rows"] for name in order]
        assert rows == sorted(rows, reverse=True)  # each stage only drops
        assert s["mix"]["rows"] <= s["split"]["rows"]
        assert not any(st["resumed"] for st in s.values())
        assert set(m1["final"]) == {"train", "val", "test"}
        assert sum(m1["final"].values()) == s["mix"]["rows"]

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
        assert s["quality"]["resumed"] and s["exact"]["resumed"] \
            and s["neardup"]["resumed"]
        assert not s["decontam"]["resumed"] and not s["split"]["resumed"] \
            and not s["mix"]["resumed"]
        # stricter overlap cut can only drop more docs
        assert s["decontam"]["rows"] <= s["neardup"]["rows"]
