"""Resumable corpus-curation pipeline (training-data hygiene) for
spark-submit — the documents-side sibling of run_pipeline.py.

    spark-submit --py-files dtaidistance_spark.zip scripts/curate_corpus.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --workdir /tmp/curate_work

Chains the engine's training-data operators into one checkpointed
pipeline over a documents corpus:

    1 pii       PII scrub: emails/IPs/phones/ids redacted BEFORE anything
                else reads the text (counts kept as columns)
    2 quality   quality_score + Gopher repetition filters, threshold cut
    3 exact     exact-dup collapse (one representative per normalized text)
    4 spans     repeated-substring coverage cut (Lee et al.-style
                hash-window spans: drop docs mostly made of text that
                repeats anywhere in the corpus)
    5 neardup   MinHash-LSH pairs -> connected components -> dedup_apply
    6 decontam  drop docs sharing >= min-overlap k-shingles with the eval set
    7 ppl       CCNet-style bigram-LM perplexity cut (LM trained on the
                surviving corpus itself; high-ppl tail dropped)
    8 split     deterministic md5-bucket train/val/test assignment
    9 mix       stratified per-language sampling of the train split
   10 pack      deterministic concat-and-chunk sequence packing of the
                train mix (two-phase distributed prefix sum)

Every stage goes through operators/checkpoint.run_stage: parquet data +
a JSON manifest with per-partition lineage (rows per partition + an
order-insensitive content checksum) and wall time, completion marked by
an atomic manifest rename.  A rerun resumes from the last completed
stage; each stage's fingerprint chains the upstream fingerprint with its
own parameters, so changing any knob recomputes exactly that stage and
everything downstream — earlier stages stay cached.  Emits ONE JSON
metrics line (per-stage rows/wall/resumed + final mix counts).

At 100 TB every stage is the scale-shape the operators were built with:
the quality pass is a scan-side filter (one Arrow map for repetition
features), exact/near dedup shuffle only md5 keys and banded signatures,
the span cut shuffles only 60-bit window hashes and broadcasts the
filtered hot set back, decontamination broadcasts the eval-set shingles
so the corpus scan never shuffles, and split/mix are pushdown-able hash
predicates.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _fp(*parts) -> str:
    return hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()


def curate(spark: SparkSession, args) -> dict:
    from dtaidistance_spark.operators.checkpoint import read_manifest, run_stage
    from dtaidistance_spark.operators.dedup import (
        connected_components, dedup_apply, decontaminate, exact_dedup,
        minhash_lsh_pairs, repeated_spans)
    from dtaidistance_spark.operators.text import (
        assign_split, pack_sequences, perplexity_filter, quality_score,
        redact_pii, repetition_stats, sample_stratified)

    wd = args.workdir
    docs = spark.read.parquet(args.input)
    stages: list[tuple[str, str]] = []  # (name, fingerprint) in order

    def stage(name, fp, df_fn):
        before = read_manifest(wd, name)
        out = run_stage(spark, name, df_fn, wd, fingerprint=fp)
        after = read_manifest(wd, name)
        stages.append((name, fp))
        resumed = before is not None and before.get("written_at") == \
            after.get("written_at")
        return out, {"rows": after["rows"], "wall_sec": after["wall_sec"],
                     "resumed": resumed}

    metrics: dict = {"input": args.input, "stages": {}}

    # 1 PII scrub FIRST: nothing downstream (including the eval slice
    # used for decontamination) ever sees unredacted text; the counts
    # ride along as columns.  "pii-v1" versions the pattern set.
    fp0 = _fp("pii", "pii-v1")
    def pii_fn():
        red = redact_pii(docs).select(
            "doc_id", F.col("clean_text").alias("text"), "n_pii")
        return docs.drop("text").join(red, "doc_id")
    docs_scrubbed, metrics["stages"]["pii"] = stage("pii", fp0, pii_fn)
    docs = docs_scrubbed

    # 2 quality: engine-native features, threshold cut
    fp1 = _fp("quality", fp0, args.quality_min, args.top_bigram_max,
              args.dup_token_max)
    def q_fn():
        feats = quality_score(docs).select(
            "doc_id", F.col("quality").alias("score"))
        reps = repetition_stats(docs).select(
            "doc_id", "top_bigram_frac", "dup_token_frac")
        keep = (feats.join(reps, "doc_id")
                .where((F.col("score") >= args.quality_min)
                       & (F.col("top_bigram_frac") <= args.top_bigram_max)
                       & (F.col("dup_token_frac") <= args.dup_token_max))
                .select("doc_id"))
        return docs.join(keep, "doc_id", "semi")
    cur, metrics["stages"]["quality"] = stage("quality", fp1, q_fn)

    # 2 exact dedup: keep one representative per normalized text
    fp2 = _fp("exact", fp1)
    def e_fn():
        reps = exact_dedup(cur).select(
            F.col("rep_doc_id").alias("doc_id"))
        return cur.join(reps, "doc_id", "semi")
    cur, metrics["stages"]["exact"] = stage("exact", fp2, e_fn)

    # 3 repeated-span coverage cut: drop docs whose corpus-repeated
    # token coverage exceeds the threshold (exact dups are already
    # collapsed, so what this catches is boilerplate-heavy documents)
    fp2b = _fp("spans", fp2, args.span_k, args.span_cover_max)
    def sp_fn():
        spans = repeated_spans(cur, k=args.span_k)
        cover = spans.groupBy("doc_id").agg(
            F.sum(F.col("span_end") - F.col("span_start"))
            .alias("dup_toks"))
        ntok = cur.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"))
        drop = (cover.join(ntok, "doc_id")
                .where(F.col("dup_toks")
                       > args.span_cover_max * F.col("n_toks"))
                .select("doc_id"))
        return cur.join(drop, "doc_id", "left_anti")
    cur, metrics["stages"]["spans"] = stage("spans", fp2b, sp_fn)

    # 4 near dedup: LSH pairs -> transitive closure -> keep representatives
    fp3 = _fp("neardup", fp2b, args.minhash_hashes, args.minhash_bands,
              args.jaccard_threshold)
    def n_fn():
        pairs = minhash_lsh_pairs(cur, n_hashes=args.minhash_hashes,
                                  bands=args.minhash_bands,
                                  threshold=args.jaccard_threshold)
        clusters = connected_components(pairs)
        return dedup_apply(cur, clusters)
    cur, metrics["stages"]["neardup"] = stage("neardup", fp3, n_fn)

    # 5 decontamination vs the deterministic eval slice
    fp4 = _fp("decontam", fp3, args.bench_mod, args.shingle_k,
              args.min_overlap)
    def d_fn():
        bench = docs.where(F.col("doc_id") % args.bench_mod == 0)
        train = cur.where(F.col("doc_id") % args.bench_mod != 0)
        flagged = decontaminate(train, bench, k=args.shingle_k,
                                min_overlap=args.min_overlap) \
            .select("doc_id")
        return train.join(flagged, "doc_id", "left_anti")
    cur, metrics["stages"]["decontam"] = stage("decontam", fp4, d_fn)

    # 7 perplexity cut: add-k bigram LM trained on the surviving
    # corpus itself (CCNet-style); docs in the high-perplexity tail are
    # dropped, sub-2-token docs (NULL score) pass through
    fp4b = _fp("ppl", fp4, args.ppl_max)
    def ppl_fn():
        scored = perplexity_filter(cur, cur)
        keep = scored.where(F.col("perplexity").isNull()
                            | (F.col("perplexity") <= args.ppl_max))             .select("doc_id")
        return cur.join(keep, "doc_id", "semi")
    cur, metrics["stages"]["ppl"] = stage("ppl", fp4b, ppl_fn)

    # 8 deterministic split
    fp5 = _fp("split", fp4b, args.split_salt)
    def s_fn():
        return assign_split(cur, salt=args.split_salt)
    cur, metrics["stages"]["split"] = stage("split", fp5, s_fn)

    # 7 stratified mix of the train split; val/test pass through
    rates = dict(kv.split("=") for kv in args.mix_rates.split(","))
    rates = {k: int(v) for k, v in rates.items()}
    fp6 = _fp("mix", fp5, sorted(rates.items()), args.mix_salt)
    def m_fn():
        train = cur.where(F.col("split") == "train")
        rest = cur.where(F.col("split") != "train")
        mixed = sample_stratified(train, rates, salt=args.mix_salt,
                                  default_per_mille=args.mix_default)
        return mixed.unionByName(rest)
    final, metrics["stages"]["mix"] = stage("mix", fp6, m_fn)

    # 10 sequence packing of the train mix: assign every train doc its
    # global token offset and context-window ids (val/test pass through
    # with NULL pack columns — they are never packed into train windows)
    fp7 = _fp("pack", fp6, args.pack_seq_len)
    def p_fn():
        train = final.where(F.col("split") == "train")
        packed = pack_sequences(train, seq_len=args.pack_seq_len,
                                n_buckets=64)             .select("doc_id", "global_offset", "first_pack",
                    "offset_in_pack", "last_pack", "n_chunks")
        return final.join(packed, "doc_id", "left")
    final, metrics["stages"]["pack"] = stage("pack", fp7, p_fn)

    metrics["final"] = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    metrics["final_checksum"] = read_manifest(wd, "pack")["checksum"]
    return metrics


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--quality-min", type=float, default=0.05)
    ap.add_argument("--top-bigram-max", type=float, default=0.5)
    ap.add_argument("--dup-token-max", type=float, default=0.95)
    ap.add_argument("--span-k", type=int, default=8)
    ap.add_argument("--span-cover-max", type=float, default=0.9)
    ap.add_argument("--minhash-hashes", type=int, default=16)
    ap.add_argument("--minhash-bands", type=int, default=4)
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--bench-mod", type=int, default=37)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--min-overlap", type=int, default=3)
    ap.add_argument("--split-salt", default="split-v1")
    ap.add_argument("--mix-rates", default="en=800,de=400,fr=200,es=100,zh=50")
    ap.add_argument("--mix-default", type=int, default=0)
    ap.add_argument("--mix-salt", default="mix-v1")
    ap.add_argument("--ppl-max", type=float, default=34.0)
    ap.add_argument("--pack-seq-len", type=int, default=512)
    args = ap.parse_args(argv)

    spark = SparkSession.getActiveSession()
    if spark is None:
        from dtaidistance_spark.session import get_spark
        spark = get_spark(app_name="curate_corpus")

    t0 = time.time()
    metrics = curate(spark, args)
    metrics["wall_sec"] = round(time.time() - t0, 3)
    print("CURATE_RESULT " + json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
