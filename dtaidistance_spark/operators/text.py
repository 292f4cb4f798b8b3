"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline layer: language ID, quality scoring, token
counting, fingerprinting, deterministic split/sampling, Gopher
repetition filters, PII redaction, sequence packing, CCNet perplexity
scoring, BPE tokenizer training/encoding, and TF-IDF keywords.

Default execution model: built-in ``pyspark.sql.functions`` column
algebra (JVM-side, whole-stage-codegen), so the same expressions run
unchanged over 100 TB of documents with filters and projections pushed
to the parquet scan.  Two deliberate exceptions use a shuffle-free
Arrow ``mapInPandas`` pass instead — ``repetition_stats`` (within-row
n-gram hash-counting; the interpreted HOF formulation measured ~1000x
slower, see its docstring) and ``bpe_encode`` (rank-priority merge
application with a per-batch word cache) — both map-only plans with no
exchange at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["的", "是", "了", "在", "我"],
}

_TOKEN_SEP = "\\s+"


def tokens_col(text_col) -> F.Column:
    return F.split(F.trim(text_col), _TOKEN_SEP)


def norm_text_col() -> F.Column:
    """THE normalized-text expression (lower, trim, whitespace
    collapse) shared by fingerprinting, dedup (operators/dedup.py
    ``_norm_text`` and streaming/dedup_stream.py import this), the
    bigram LM, BPE and TF-IDF — one definition so batch, streaming and
    the DuckDB oracle twins cannot drift on what "same text" means."""
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), _TOKEN_SEP, " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (≈ ceil(chars/4), the common ~4-chars-per-token heuristic)."""
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("n_subwords_est"),
        F.round(F.length(F.regexp_replace("text", _TOKEN_SEP, "")) /
                F.greatest(F.size(toks), F.lit(1)), 6).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality features + a composite score:
    length, punctuation density, stopword ratio, mean word length —
    the standard cheap pre-filters of large text-corpus pipelines."""
    toks = tokens_col(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length("text"), F.lit(1))
    punct = F.length(F.regexp_replace("text", "[^.,;:!?'\"()]", ""))
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    punct_ratio = punct / n_chars
    stop_ratio = stop_hits / n_tok
    mean_word = F.length(F.regexp_replace("text", _TOKEN_SEP, "")) / n_tok
    score = (
        F.when(F.length("text") < 20, 0.0).otherwise(1.0)
        * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        * (F.lit(0.5) + F.least(stop_ratio * 2, F.lit(0.5)))
        * F.when((mean_word >= 2) & (mean_word <= 12), 1.0).otherwise(0.5)
    )
    return docs.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language heuristic: score each candidate language by
    stopword hits per token; argmax wins (ties broken alphabetically)."""
    toks = tokens_col(F.lower(F.col("text")))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    scores = {}
    for lang in sorted(LANG_STOPWORDS):
        stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scores[lang] = hits / n_tok
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # first language in alphabetical order achieving the max wins
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return docs.select(
        "doc_id", "lang",
        pred.alias("lang_pred"),
        F.round(best, 6).alias("lang_score"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprints: md5 of the normalized text
    (exact-dup key) and a min-hash-style shingle fingerprint (min md5
    over 3-token shingles) — a 1-permutation MinHash."""
    norm = norm_text_col()
    toks = F.split(norm, " ")
    n = F.size(toks)
    sh_idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    shingles = F.transform(
        sh_idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("exact_fp"),
        F.array_min(F.transform(shingles, F.md5)).alias("shingle_fp"),
    )


def assign_split(docs: DataFrame,
                 weights=(("train", 90), ("val", 5), ("test", 5)),
                 key_col: str = "doc_id",
                 salt: str = "split-v1") -> DataFrame:
    """Deterministic train/val/test assignment — the training-pipeline
    split that must be stable across reruns, repartitions, and engine
    versions (``randomSplit`` is none of those).

    bucket = md5(salt || key) mod sum(weights); the row goes to the
    first split whose cumulative weight exceeds its bucket.  Pure
    column algebra (whole-stage codegen) over a content-independent
    key; changing ``salt`` re-rolls the whole assignment atomically.
    md5 (not xxhash64) keeps the bucket reproducible outside Spark —
    the DuckDB twin hashes identically (dedup.py::_md5_long note).
    """
    from .dedup import _md5_long

    total = sum(w for _, w in weights)
    bucket = _md5_long(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % total
    expr, cum = None, 0
    for name, w in weights:
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021,
    "Scaling Language Models" appendix A1.1, public): per-document
    duplicate-token fraction and most-frequent-2-gram / 3-gram mass.
    Documents dominated by a single repeated phrase are boilerplate and
    get filtered before training.

    Implemented as ONE shuffle-free Arrow ``mapInPandas`` pass: the
    per-document n-gram counting is intrinsically a within-row
    hash-count (Counter), which Spark's higher-order functions can only
    express as an interpreted O(distinct x n) lambda re-evaluated per
    element (measured ~25 ms/doc — 1000x the Python hash-count), and an
    explode+groupBy formulation would shuffle the entire n-gram stream
    at corpus scale.  The map-only plan is scan -> project -> UDF:
    embarrassingly parallel at 100 TB, no exchange anywhere, and the
    scan reads only (doc_id, text).  Ties on the top n-gram break to
    the lexicographically smallest so results are deterministic and
    engine-portable (DuckDB twin in plans/driver_queries.py).
    """
    import pandas as pd  # local import keeps module import light

    out_schema = ("doc_id long, n_tokens int, dup_token_frac double, "
                  "top_bigram string, top_bigram_frac double, "
                  "top_trigram_frac double")

    def _stats(batches):
        from collections import Counter

        def top_frac(grams):
            if not grams:
                return "", 0.0
            c = Counter(grams)
            best_n = max(c.values())
            best_g = min(g for g, k in c.items() if k == best_n)
            return best_g, round(best_n / len(grams), 6)

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL/empty/whitespace-only docs: 0 tokens, all-zero
                # stats (ADVICE r4 — previously crashed on NULL and
                # reported dup=1.0 for empty; the SQL twin guards the
                # same way so the edge case is pinned, not untested)
                toks = (text or "").lower().strip().split()
                n = len(toks)
                dup = round(1.0 - len(set(toks)) / n, 6) if n else 0.0
                bg, bgf = top_frac(
                    [f"{a} {b}" for a, b in zip(toks, toks[1:])])
                _, tgf = top_frac(
                    [f"{a} {b} {c}" for a, b, c
                     in zip(toks, toks[1:], toks[2:])])
                rows.append((doc_id, n, dup, bg, bgf, tgf))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_tokens", "dup_token_frac", "top_bigram",
                "top_bigram_frac", "top_trigram_frac"])

    return docs.select("doc_id", "text").mapInPandas(_stats, out_schema)


def sample_stratified(docs: DataFrame,
                      rates: dict,
                      stratum_col: str = "lang",
                      key_col: str = "doc_id",
                      default_per_mille: int = 0,
                      salt: str = "mix-v1") -> DataFrame:
    """Deterministic stratified sampling — the data-mixing primitive
    that up-/down-weights corpus slices (by language, source, quality
    band) when assembling a training mix.  ``rates`` maps stratum value
    to a keep-rate in per-mille; a row survives iff
    ``md5(salt:key) mod 1000 < rate(stratum)``.

    Content-independent and repartition-stable (unlike ``df.sample``,
    whose output depends on partitioning), so reruns and resumed jobs
    keep identical rows; the md5 bucket is engine-portable for the SQL
    oracle twin.  Pure column algebra: the predicate pushes into the
    scan's filter stage and the operator needs no shuffle at any scale.
    """
    from .dedup import _md5_long

    bucket = _md5_long(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % 1000
    rate = None
    for value, pm in sorted(rates.items()):
        cond = F.col(stratum_col) == value
        rate = F.when(cond, pm) if rate is None else rate.when(cond, pm)
    rate = rate.otherwise(default_per_mille) if rate is not None \
        else F.lit(default_per_mille)
    return docs.where(bucket < rate)


# PII patterns — deliberately restricted to the regex subset that Java
# (Spark's regexp_replace) and RE2 (DuckDB/Go/Rust engines) evaluate
# identically: character classes, bounded repetition, word boundaries;
# no backreferences, no lookaround.  Order matters (email before ipv4
# before phone/ssn) and is part of the operator contract so redacted
# text is engine-portable byte-for-byte.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the scrubbing pass every training
    corpus runs before anything else sees the text (emails, IPv4
    addresses, US-style phone numbers, SSN-shaped ids).

    Pure JVM column algebra: one ``regexp_count`` per category for the
    detection counts plus a fixed chain of ``regexp_replace`` calls for
    the redacted text — no Python, no shuffle, whole-stage-codegen'd,
    and the (doc_id, text) projection prunes the scan.  At 100 TB this
    is a map-only pass limited by parquet scan speed.  Patterns are
    applied in the fixed ``PII_PATTERNS`` order (email -> ipv4 ->
    phone -> ssn) so overlapping matches resolve identically in every
    engine; replacement tokens contain no digits or '@', so the pass is
    idempotent (redact(redact(x)) == redact(x), pinned in tests).
    """
    text = F.col(text_col)
    cols = [F.col("doc_id")]
    clean = text
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(text, F.lit(pat)).alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, token)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return docs.select(*cols, clean.alias("clean_text")) \
               .withColumn("n_pii", total.cast("int"))


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   n_buckets: int = 64,
                   order_col: str = "doc_id") -> DataFrame:
    """Deterministic sequence packing — the concat-and-chunk step that
    turns a curated corpus into fixed-length training sequences: all
    documents are concatenated in a stable global order (``order_col``)
    and the token stream is cut into ``seq_len``-token context windows.
    Emits, per document, its global token offset and the pack (chunk)
    ids it lands in, so a downstream writer can group by ``first_pack``
    and materialize the actual windows.

    The global running sum is the scale problem: a naive
    ``Window.orderBy(order_col)`` collapses the corpus onto ONE
    partition.  Instead this is the classic two-phase distributed
    prefix sum: (1) range-bucket the order key and aggregate per-bucket
    token totals — one tiny shuffle producing ``n_buckets`` rows;
    (2) compute exclusive bucket offsets on the driver (n_buckets
    scalars, not data) and broadcast them back; (3) a per-bucket window
    cumsum, partitioned by bucket, runs fully parallel.  At 100 TB with
    n_buckets ~ O(cluster cores x 4) no task ever sees more than one
    bucket's rows and the only global object is the n_buckets-row
    offset map.
    """
    from pyspark.sql import Window

    toks = tokens_col(F.col("text"))
    base = docs.select(F.col(order_col).alias("_ord"), "doc_id",
                       F.size(toks).cast("long").alias("n_tokens"))

    lo, hi = base.agg(F.min("_ord"), F.max("_ord")).first()
    if lo is None:  # empty corpus: keep the output schema, zero rows
        return base.select(
            "doc_id", "n_tokens",
            F.lit(None).cast("long").alias("global_offset"),
            F.lit(None).cast("long").alias("first_pack"),
            F.lit(None).cast("long").alias("offset_in_pack"),
            F.lit(None).cast("long").alias("last_pack"),
            F.lit(None).cast("int").alias("n_chunks"))
    span = max(int(hi) - int(lo) + 1, 1)
    bucket_w = -(-span // n_buckets)  # ceil
    bucketed = base.withColumn(
        "_bkt", ((F.col("_ord") - F.lit(int(lo))) / bucket_w)
        .cast("long"))

    # phase 1: per-bucket totals (tiny: n_buckets rows to the driver)
    totals = {r["_bkt"]: r["t"] for r in
              bucketed.groupBy("_bkt").agg(F.sum("n_tokens").alias("t"))
              .collect()}
    run, offsets = 0, {}
    for b in sorted(totals):
        offsets[b] = run
        run += totals[b]
    off_expr = F.lit(0).cast("long")
    for b, off in offsets.items():
        off_expr = F.when(F.col("_bkt") == b, F.lit(off)).otherwise(off_expr)

    # phase 2: per-bucket parallel cumsum + broadcast bucket offset.
    # doc_id joins the ordering and the frame is ROWS (not the default
    # RANGE): with duplicate order_col values, RANGE would give peer
    # rows the SAME cumulative sum — overlapping token ranges, silent
    # pack corruption.
    w = Window.partitionBy("_bkt").orderBy("_ord", "doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("n_tokens").over(w)
    offset = (off_expr + cum - F.col("n_tokens")).alias("global_offset")
    out = bucketed.select("doc_id", "n_tokens", offset)
    L = F.lit(int(seq_len))
    first = F.floor(F.col("global_offset") / L).cast("long")
    last = F.floor((F.col("global_offset") + F.col("n_tokens") - 1) / L) \
        .cast("long")
    return out.select(
        "doc_id", "n_tokens", "global_offset",
        first.alias("first_pack"),
        (F.col("global_offset") % L).cast("long").alias("offset_in_pack"),
        last.alias("last_pack"),
        (last - first + 1).cast("int").alias("n_chunks"),
    )


def perplexity_filter(docs: DataFrame, train: DataFrame,
                      k: float = 0.5) -> DataFrame:
    """CCNet-style perplexity quality filter (Wenzek et al. 2020,
    public): train an add-k-smoothed bigram language model on a
    reference slice, score every document's per-token perplexity, and
    let the caller cut the tail.  Low-perplexity ≈ fluent prose;
    boilerplate and word-salad score high.

    Distributed shape: the LM "training" is two count aggregations over
    the exploded token stream (one shuffle each, map-side partial);
    scoring is two keyed equi-joins of the corpus bigram stream against
    the count tables (AQE picks broadcast when the LM is small, sort-
    merge when it is corpus-sized) plus one per-doc aggregate.  No
    driver-side model object — the LM stays a DataFrame, so a 100 TB
    corpus trains and scores without any single node holding the vocab.

    P(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + k) / (c1(w_{i-1}) + k * V),
    V = |train vocab| + 1 (unseen); ppl = exp(-mean log P).  Documents
    with fewer than two tokens have no bigrams and score NULL.
    """
    def toks_df(df):
        norm = norm_text_col()
        return df.select("doc_id", F.split(norm, " ").alias("toks"))

    def bigrams(df):
        t = toks_df(df)
        idx = F.sequence(F.lit(0), F.size("toks") - 2)
        pairs = F.transform(idx, lambda i: F.struct(
            F.element_at("toks", i + 1).alias("prev"),
            F.element_at("toks", i + 2).alias("cur")))
        return t.where(F.size("toks") >= 2) \
            .select("doc_id", F.explode(pairs).alias("bg")) \
            .select("doc_id", F.col("bg.prev").alias("prev"),
                    F.col("bg.cur").alias("cur"))

    uni = toks_df(train).select(F.explode("toks").alias("tok")) \
        .groupBy("tok").agg(F.count("*").alias("c1"))
    big = bigrams(train).groupBy("prev", "cur") \
        .agg(F.count("*").alias("c2"))
    vocab = uni.count() + 1  # scalar, not data: |V| + 1 for unseen

    scored = (bigrams(docs)
              .join(big, ["prev", "cur"], "left")
              .join(uni.withColumnRenamed("tok", "prev"), ["prev"], "left")
              .withColumn("lp", F.log(
                  (F.coalesce("c2", F.lit(0)) + F.lit(float(k))) /
                  (F.coalesce("c1", F.lit(0)) + F.lit(float(k * vocab)))))
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.sum("lp").alias("s")))
    out = docs.select("doc_id").join(scored, ["doc_id"], "left")
    ppl = F.exp(-F.col("s") / F.col("n_bigrams"))
    return out.select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
        F.round("s", 6).alias("log_prob"),
        F.round(ppl, 6).alias("perplexity"),
    )


def _word_types(docs: DataFrame) -> DataFrame:
    """Word-type table (word, freq): the classic BPE reduction — all
    later work is over distinct word TYPES weighted by frequency, so the
    expensive corpus scan happens exactly once (one shuffle)."""
    norm = norm_text_col()
    return docs.select(F.explode(F.split(norm, " ")).alias("word")) \
        .where(F.length("word") > 0) \
        .groupBy("word").agg(F.count("*").alias("freq"))


def _sym_pairs(sym_col, freq_col) -> F.Column:
    """Adjacent symbol pairs of one word, each weighted by word freq."""
    n = F.size(sym_col)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0)))
    return F.when(n >= 2, F.transform(
        idx, lambda i: F.struct(
            F.element_at(sym_col, i).alias("left"),
            F.element_at(sym_col, i + 1).alias("right"),
            freq_col.alias("freq")))).otherwise(F.array())


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """Symbol-pair frequencies over the word-type table — iteration 0
    of BPE tokenizer training (Sennrich et al. 2016, public): each word
    starts as its character sequence; every adjacent pair counts once
    per occurrence, weighted by the word's corpus frequency.

    Two shuffles total at any corpus size: the word-type groupBy (the
    only pass over the raw corpus) and the pair-count groupBy over the
    exploded TYPE table (vocab-sized, not corpus-sized).
    """
    w = _word_types(docs)
    chars = F.transform(F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.col("word").substr(i, F.lit(1)))
    syms = w.select(F.col("freq"), chars.alias("syms"))
    return syms.select(F.explode(_sym_pairs(F.col("syms"),
                                            F.col("freq"))).alias("p")) \
        .groupBy(F.col("p.left").alias("left"),
                 F.col("p.right").alias("right")) \
        .agg(F.sum("p.freq").alias("cnt"))


def learn_bpe(docs: DataFrame, n_merges: int = 10,
              checkpoint_every: int = 8) -> list:
    """BPE merge-rule learning as a Spark loop: each iteration counts
    adjacent symbol pairs over the word-TYPE table, picks the most
    frequent pair (ties broken lexicographically so the rule list is
    deterministic and engine-portable), and rewrites every word's
    symbol array with a greedy left-to-right non-overlapping merge —
    a pure JVM ``F.aggregate`` fold, no Python in the loop.

    Returns the ordered merge list [(left, right), ...].  Scale shape:
    the corpus is scanned ONCE (word-type groupBy); every iteration
    after that runs over the vocab-sized type table (millions of rows
    at 100 TB, not trillions), one tiny 1-row argmax collect per merge,
    with ``localCheckpoint`` every ``checkpoint_every`` iterations to
    keep the transform lineage from stacking n_merges plans deep.
    """
    w = _word_types(docs)
    chars = F.transform(F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.col("word").substr(i, F.lit(1)))
    syms = w.select("freq", chars.alias("syms")).persist()
    merges = []
    for it in range(n_merges):
        best = (syms.select(F.explode(_sym_pairs(F.col("syms"),
                                                 F.col("freq"))).alias("p"))
                .groupBy("p.left", "p.right")
                .agg(F.sum("p.freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1).collect())
        if not best or best[0]["cnt"] < 2:
            break
        a, b = best[0]["left"], best[0]["right"]
        merges.append((a, b))
        # greedy left-to-right non-overlapping merge as a JVM fold:
        # carry (out-array, pending-symbol); flush pending on mismatch
        merged = F.aggregate(
            "syms",
            F.struct(F.array().cast("array<string>").alias("out"),
                     F.lit(None).cast("string").alias("pend")),
            lambda acc, s: F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend"))
            ).when(
                (acc["pend"] == a) & (s == b),
                F.struct(F.concat(acc["out"],
                                  F.array(F.lit(a + b))).alias("out"),
                         F.lit(None).cast("string").alias("pend"))
            ).otherwise(
                F.struct(F.concat(acc["out"],
                                  F.array(acc["pend"])).alias("out"),
                         s.alias("pend"))),
            lambda acc: F.when(acc["pend"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
        )
        nxt = syms.select("freq", merged.alias("syms"))
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        nxt = nxt.persist()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges


def bpe_encode(docs: DataFrame, merges: list) -> DataFrame:
    """Apply learned BPE merges — the encode half of the tokenizer:
    each word is split to characters, then the lowest-rank applicable
    merge is applied (greedy left-to-right within a rank) until no
    learned pair remains.  Semantically identical to replaying the
    merge list in training order.

    One Arrow ``mapInPandas`` pass with the rank table broadcast inside
    the closure (a tokenizer merge table is KBs-to-MBs — never corpus
    data) and a per-batch word cache, so each distinct word in a batch
    is encoded once.  Map-only: no shuffle at any corpus size.  Emits
    per-doc BPE token count and the encoded sequence; the whitespace
    token count rides along so the subword/word ratio (fertility) is
    one division away.
    """
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out_schema = ("doc_id long, n_words int, n_bpe_tokens int, "
                  "bpe_tokens array<string>")

    def _encode_word(word, cache):
        if word in cache:
            return cache[word]
        syms = list(word)
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            a, b = syms[bi], syms[bi + 1]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    def _batches(it):
        for pdf in it:
            cache = {}
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = (text or "").lower().strip().split()
                toks = []
                for w in words:
                    toks.extend(_encode_word(w, cache))
                rows.append((doc_id, len(words), len(toks), toks))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_words", "n_bpe_tokens", "bpe_tokens"])

    return docs.select("doc_id", "text").mapInPandas(_batches, out_schema)


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (idf = ln((N + 1) / (df + 1)) + 1) with a deterministic
    (score desc, term asc) tie-break.

    Plan: one explode + (doc, term) count (shuffle 1), a term-level
    document-frequency aggregate over the distinct (doc, term) pairs
    (shuffle 2, term-space sized), a keyed equi-join back (AQE
    broadcasts a small vocabulary), and a per-doc window top-k — every
    exchange is keyed, nothing global.
    """
    from pyspark.sql import Window

    norm = norm_text_col()
    toks = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("term")) \
        .where(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # scalar, not data
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1
    scored = tf.join(df_, ["term"]) \
        .withColumn("tfidf", F.round(F.col("tf") * idf, 6))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k) \
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "tfidf",
                F.col("rank").cast("int").alias("rank"))


QUALITY_LR_FEATURES = ("punct_ratio", "stop_ratio", "mean_word_len",
                       "log_len")


def _quality_features(docs: DataFrame) -> DataFrame:
    """Feature projection for the quality classifier: the quality_score
    heuristics plus log-length, all pure column algebra."""
    q = quality_score(docs)
    lens = docs.select("doc_id", F.log(F.greatest(F.length("text"),
                                                  F.lit(1)).cast("double"))
                       .alias("log_len"))
    return q.join(lens, "doc_id").select(
        "doc_id", "punct_ratio", "stop_ratio", "mean_word_len", "log_len")


def train_quality_classifier(docs: DataFrame, label_col,
                             n_iter: int = 3, lr: float = 1.0):
    """Train a logistic-regression quality classifier with full-batch
    gradient descent where EVERY iteration is one Spark aggregate — the
    fastText-style "train a quality filter on weak labels" step of
    large-corpus pipelines (GPT-3 appendix A, public), sized so the
    model is a handful of floats and the data never leaves the cluster.

    Per iteration: grad_j = sum_i (sigmoid(w.x_i) - y_i) x_ij — one
    map-side-combined aggregate over the feature projection (no
    shuffle beyond the 1-row reduce); the driver holds only w (d+1
    floats).  Deterministic given the input (full-batch, no sampling),
    so the whole optimization replays in SQL as chained CTEs — the
    driver oracle hash-checks distributed GD end-to-end.

    Returns (weights, scored): weights = [bias, *feature_ws] after
    ``n_iter`` steps; scored = (doc_id, y, score) with the final
    per-doc sigmoid.
    """
    from ..resources import track_persist

    # persisted through the GD loop: every iteration re-aggregates the
    # same feature projection (n_iter + 2 passes otherwise), and the
    # returned `scored` plan reads it lazily — registry-tracked so
    # harnesses can release it after execution (resources.py contract)
    feats = track_persist(_quality_features(docs).join(
        docs.select("doc_id", F.when(label_col, 1.0).otherwise(0.0)
                    .alias("y")), "doc_id").persist())
    cols = list(QUALITY_LR_FEATURES)
    w = [0.0] * (len(cols) + 1)
    n = feats.count()  # scalar for the 1/n step scale
    for _ in range(n_iter):
        z = F.lit(w[0])
        for j, c in enumerate(cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        aggs = [F.sum(resid).alias("g0")]
        aggs += [F.sum(resid * F.col(c)).alias(f"g{j + 1}")
                 for j, c in enumerate(cols)]
        g = feats.agg(*aggs).first()
        w = [w[k] - lr * float(g[f"g{k}"]) / n for k in range(len(w))]
    z = F.lit(w[0])
    for j, c in enumerate(cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    scored = feats.select(
        "doc_id", F.col("y").cast("int").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"))
    return w, scored
