"""End-to-end golden pins for the rows-only driver queries.

The ``queries()`` entries in the rows-only tail have no DuckDB SQL
oracle (iterative argmin loops with reseeding / masked-argmax loops /
~400M-cell DP lattices at sf0.01), so the driver only checks row counts
for them.  These tests pin the *driver query's* exact output at sf0.001
— a plan or kernel change that perturbs any value is caught here even
without the driver (VERDICT r3 next-round item 4).  ``symbolize``
gained a full chained-CTE value oracle in r4; its digest pin stays as
an extra sf0.001 guard.

Goldens were captured from the current implementation, whose kernels are
all reference-oracled in the other test modules; the pins freeze the
end-to-end composition (rollup → gap-fill → arrays → kernel → output),
not just the kernels.
"""

import hashlib
import json

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    rows = df.collect()
    cols = sorted(df.columns)

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(norm(r[c]) for c in cols) for r in rows)


def _digest(canon) -> str:
    return hashlib.sha256(
        json.dumps([list(t) for t in canon]).encode()).hexdigest()[:16]


# kmeans centers come out of a distributed DBA partial-sum reduce, so the
# exact floats depend on partition composition (FP addition is not
# associative; the reference's multiprocessing pool has the same
# property).  This golden is therefore pinned to the conftest session
# config (local[4], shuffle_partitions=8); the other five queries below
# are partition-invariant (identical at local[4] and local[8]).
# regenerated r5: kmeans_dtw's default init moved to the 3-job
# k-means|| seeding (kmeans_par_centers) — different seed centers,
# different (equally valid) local optimum
GOLDEN_KMEANS = [
    ("0", "1.687371", "8"), ("0", "2.596739", "2"), ("0", "2.691293", "1"),
    ("1", "2.079597", "11"), ("1", "2.767319", "3"), ("1", "3.301599", "7"),
    ("2", "0.000000", "6"), ("3", "1.793503", "13"), ("3", "2.457914", "12"),
    ("3", "2.911660", "9"), ("3", "3.054908", "4"), ("3", "3.106296", "0"),
    ("3", "3.394964", "14"), ("3", "3.517843", "10"), ("3", "3.586871", "5"),
]

GOLDEN_LOCO = [
    ("210", "19", "202", "user11", "367.000000"),
    ("219", "5", "211", "user10", "387.000000"),
    ("242", "432", "234", "user10", "429.000000"),
    ("250", "420", "234", "user0", "447.000000"),
    ("250", "450", "242", "user0", "455.000000"),
    ("252", "441", "244", "user11", "443.000000"),
    ("255", "419", "239", "user1", "465.000000"),
    ("255", "455", "255", "user11", "455.000000"),
    ("255", "457", "255", "user10", "457.000000"),
    ("255", "469", "247", "user1", "473.000000"),
    ("255", "471", "255", "user0", "471.000000"),
    ("255", "481", "255", "user1", "481.000000"),
]

# (row_count, sha256[:16] of the json-encoded canonical row set)
GOLDEN_DIGESTS = {
    "symbolize": (2216, "e71e024881d81e68"),
    "dtw_distance_matrix": (105, "43a74174b2fdaadd"),
    "dtw_ndim_matrix": (105, "62cf86f19a7e1a0f"),
    "dtw_flagship": (105, "27a2816e8078bb45"),
    # r4 rows-only additions: both partition-invariant (per-pair kernel;
    # weight learning is feature-row-order invariant — splits/entropy/
    # kdistance are permutation-free and value lists are sorted before use)
    "explain_pairs": (205, "18ef1be519927b1f"),
    "dtw_weights_learn": (30, "ca76b4d6fb647085"),
}


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_kmeans_clusters_golden(spark, queries):
    canon = _canon(queries["kmeans_clusters"](spark, SF_DIR))
    assert canon == GOLDEN_KMEANS


def test_loco_matches_golden(spark, queries):
    canon = _canon(queries["loco_matches"](spark, SF_DIR))
    assert canon == GOLDEN_LOCO


@pytest.mark.parametrize("name", sorted(GOLDEN_DIGESTS))
def test_rows_only_digest(spark, queries, name):
    n, dig = GOLDEN_DIGESTS[name]
    canon = _canon(queries[name](spark, SF_DIR))
    assert len(canon) == n
    assert _digest(canon) == dig
