"""Deduplication operators for document corpora.

Four families, all shuffle-conscious:

* exact:    hash-groupBy on normalized text (one shuffle on the md5 key);
* n-gram Jaccard: shingle-set self-join restricted to LSH-style shared
  shingles, so the candidate space is sparse instead of n²;
* MinHash + LSH: md5-derived signatures (md5 is deterministic and
  portable across engines, unlike engine-private hash seeds), banded and
  bucket-joined — the classic near-dup pipeline at corpus scale;
* embedding cosine: brute-force pair filter for moderate n, intended to
  be replaced by the ANN bucket join (operators/ann.py) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SEP = "\\s+"


def _norm_text():
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), _TOKEN_SEP, " ")


def _shingles(k: int = 3) -> F.Column:
    toks = F.split(_norm_text(), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact near-O(n) dedup: one representative (min doc_id) per
    normalized text; dup_count counts the collapsed group."""
    return (
        docs.select(F.col("doc_id"), F.md5(_norm_text()).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("rep_doc_id"),
             F.count("*").alias("dup_count"))
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard similarity ≥ threshold.

    Plan shape: explode shingles → self-join on shingle (co-occurrence
    join, the sparse candidate generator) → count shared shingles per
    pair → Jaccard from |A∩B| / (|A|+|B|-|A∩B|).  Only pairs sharing at
    least one shingle ever materialize, and the final filter prunes the
    rest — no n² blow-up.
    """
    sh = docs.select("doc_id", F.explode(_shingles(k)).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
               (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_inter") /
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(docs: DataFrame, n_hashes: int = 16, k: int = 3) -> DataFrame:
    """MinHash signatures: hash h_i(doc) = min over shingles of
    xxhash64(i, shingle) (JVM-native, whole-stage-codegen'd; the shingle
    array is materialized once and shared by all n_hashes transforms)."""
    with_sh = docs.select("doc_id", _shingles(k).alias("sh"))
    sig = F.array(*[
        F.array_min(F.transform(F.col("sh"),
                                lambda s, i=i: F.xxhash64(F.lit(i), s)))
        for i in range(n_hashes)
    ])
    return with_sh.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = 16, bands: int = 4,
                      k: int = 3, threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature, bucket-join
    on (band, band-hash), then estimate Jaccard as the fraction of equal
    signature components; keep pairs ≥ threshold."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signature(docs, n_hashes=n_hashes, k=k)
    banded = sigs.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[
                         F.element_at("sig", b * rows_per_band + r + 1)
                         for r in range(rows_per_band)]).alias("bkey"))
            for b in range(bands)])).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.bkey").alias("bkey"))
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) &
               (F.col("a.bkey") == F.col("b.bkey")) &
               (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                   lambda x, y: x == y), lambda eq: eq))
        / F.lit(float(n_hashes)), 6)
    return (cands.withColumn("jaccard_est", est)
            .where(F.col("jaccard_est") >= threshold)
            .select("doc_a", "doc_b", "jaccard_est"))


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over tokens: per bit, sum ±1 votes of each token's
    md5-derived 64-bit hash; sign → bit.  Pure column algebra
    (aggregate over the token array), no UDF."""
    toks = F.array_distinct(F.split(_norm_text(), " "))
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    bits = []
    for bit in range(0, 60, 4):  # 15 hex chars = 60 bits
        votes = F.aggregate(
            toks, F.lit(0),
            lambda acc, t: acc + F.when(
                F.shiftright(tok_hash(t), bit).bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1)))
        bits.append(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)) *
                    F.lit(2 ** (bit // 4)))
    sim = bits[0]
    for extra in bits[1:]:
        sim = sim + extra
    return docs.select("doc_id", sim.cast("long").alias("simhash"))


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force i<j; see
    operators/ann.py for the bucketed scale path).  Cosine is computed
    with zip_with/aggregate — JVM-side, no UDF."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(
            dot / (norm(F.col("va")) * norm(F.col("vb"))), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
