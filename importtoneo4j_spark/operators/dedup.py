"""Document deduplication family — the training-data-pipeline operators.

* exact_dedup          — content-hash groupBy, keep-min-id (HashSet dedup,
                         reference VariantDatabase.java:357, generalized)
* ngram_jaccard_pairs  — exact near-dup pairs via a df-capped inverted-index
                         self-join on token n-gram shingles (hot shingles are
                         dropped from BLOCKING only; verification runs on the
                         full shingle sets)
* minhash_near_dups    — MinHash-LSH blocking + exact-Jaccard verification;
                         the 100 TB path (md5-based, oracle-identical in SQL)
* simhash_near_dups    — 128-bit SimHash with 32-bit banded blocking +
                         Hamming verification; all native expressions, no UDF

Every blocking join here is bucket-capped (the drop_hot_buckets pattern,
operators/link.py:129): a bucket with B members emits B^2 candidate pairs,
so one boilerplate shingle / degenerate band value shared by 10^5 documents
would otherwise be an accidental cartesian product at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from importtoneo4j_spark.functions.text import (
    jaccard,
    jaccard_counts,
    minhash_bands_agg,
)
from importtoneo4j_spark.operators.link import drop_hot_buckets
from importtoneo4j_spark.session import fan_out, stage_persist


def _tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def ngrams_from_tokens(toks: Column, n: int = 5) -> Column:
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def token_ngrams(text_col: Column, n: int = 5) -> Column:
    return ngrams_from_tokens(_tokens(text_col), n)


def _token_frame(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, toks) with short documents dropped, materialized once.

    The shingle-family operators persist the TOKEN arrays, not the n-gram
    arrays (round 5): an n-gram array repeats every token n times, so
    checkpointing it serializes ~n x the bytes — measured 60% of
    minhash_near_dups' wall at sf0.1. N-grams are recomputed inline where
    needed: streamed map-side into the signature aggregation (consumed
    once — persisting buys nothing), and projected per candidate pair in
    verification (thousands of rows, not the corpus).

    fan_out before the checkpoint (round 6, guide §2.5): a corpus that
    arrives as one small parquet file scans as ONE partition, and the
    checkpoint then pins that layout — tokenize + n-gram + md5 for the
    whole corpus ran on a single core (measured: 10-25 s of the
    minhash gate's wall at sf1.0 was this serial stage). At real scale
    the scan already has >= core-count partitions and fan_out is a no-op."""
    return stage_persist(
        fan_out(
            df.filter(F.size(_tokens(F.col(text_col))) >= n).select(
                F.col(id_col).alias("doc"), _tokens(F.col(text_col)).alias("toks")
            )
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest id per distinct content hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int = 64,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs with document-frequency-pruned blocking.

    Blocking: inverted-index self-join on token n-grams, with shingles whose
    document frequency exceeds ``max_df`` dropped BEFORE the join (two-phase
    partial-aggregating count + anti-join — drop_hot_buckets, link.py:129).
    A boilerplate shingle shared by B documents otherwise yields B^2
    candidate rows; at a low-entropy corpus that single key is an accidental
    cartesian product (the reference's analog: dedup-before-expensive-work,
    VariantDatabase.java:357).

    Verification: exact Jaccard over the FULL shingle sets via native array
    ops, so the score of every emitted pair is unaffected by the pruning.
    The standard df-pruning tradeoff applies: a pair whose shared shingles
    are ALL hotter than ``max_df`` is not discovered.
    """
    toks = _token_frame(df, id_col, text_col, n)
    inv = toks.select(
        "doc", F.explode(ngrams_from_tokens(F.col("toks"), n)).alias("s")
    )
    capped = drop_hot_buckets(inv, max_df, key="s")
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(b, "s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .distinct()
    )
    return _verify_pairs(cand, toks, toks, n, threshold)


def _verify_pairs(
    cand: DataFrame,
    toks_a: DataFrame,
    toks_b: DataFrame,
    n: int,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a_id, b_id) pairs against
    token frames -> (a_id, b_id, n_inter, n_union, jac). The integer set
    sizes ride along (functions.text.jaccard_counts) so gates can derive
    a cross-engine-stable display score by integer division instead of
    rounding the small-rational double."""
    pairs = (
        cand.join(
            toks_a.select(F.col("doc").alias("a_id"), F.col("toks").alias("ta")),
            "a_id",
        )
        .join(
            toks_b.select(F.col("doc").alias("b_id"), F.col("toks").alias("tb")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            ngrams_from_tokens(F.col("ta"), n).alias("sa"),
            ngrams_from_tokens(F.col("tb"), n).alias("sb"),
        )
    )
    n_inter, n_union = jaccard_counts(F.col("sa"), F.col("sb"))
    return (
        pairs.select(
            "a_id",
            "b_id",
            n_inter.alias("n_inter"),
            n_union.alias("n_union"),
            jaccard(F.col("sa"), F.col("sb")).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """``max_bucket``: optional hot-band-bucket cap (drop_hot_buckets). The
    minhash band keys are high-entropy by construction, but a corpus with B
    exact duplicates of one document still puts all B in every band bucket;
    run exact_dedup first, or set a cap, when that is a possibility."""
    # materialize once: the token frame feeds the signature AND both
    # verification joins (shingles recomputed inline — see _token_frame),
    # sig feeds both sides of the band self-join — without these each
    # alias recomputes the full subplan (measured ~4x cost). Persist mode
    # is profile-dependent (SPARK_GRAFT_PERSIST): eager localCheckpoint
    # locally, DISK_ONLY on a cluster where lineage recovery matters —
    # see session.stage_persist / SCALE.md.
    toks = _token_frame(df, id_col, text_col, n)
    sh_sig = toks.select("doc", ngrams_from_tokens(F.col("toks"), n).alias("sh"))
    sig = stage_persist(
        minhash_bands_agg(sh_sig, "doc", "sh", num_perm, bands, rows_per_band)
    )
    if max_bucket is not None:
        sig = drop_hot_buckets(sig, max_bucket)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .distinct()
    )
    return _verify_pairs(cand, toks, toks, n, threshold)


def cross_corpus_overlap(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Train/test contamination check: near-duplicate pairs ACROSS two
    corpora (never within either) — the question every training pipeline
    must answer before holding out an eval set.

    Same MinHash-LSH machinery as minhash_near_dups, but the band join is
    A x B instead of a self-join: candidate cost is bounded by cross-bucket
    products only, and a 10^9-doc training corpus never pairs with itself.
    ``max_bucket`` (optional) caps each side's band buckets before the join.
    Returns (a_id from corpus_a, b_id from corpus_b, jac >= threshold).
    """
    ta = _token_frame(corpus_a, id_col, text_col, n)
    tb = _token_frame(corpus_b, id_col, text_col, n)

    def sig(toks: DataFrame) -> DataFrame:
        sh = toks.select("doc", ngrams_from_tokens(F.col("toks"), n).alias("sh"))
        return minhash_bands_agg(sh, "doc", "sh", num_perm, bands, rows_per_band)

    siga, sigb = sig(ta), sig(tb)
    if max_bucket is not None:
        siga = drop_hot_buckets(siga, max_bucket)
        sigb = drop_hot_buckets(sigb, max_bucket)
    cand = (
        siga.alias("a")
        .join(sigb.alias("b"), "band_key")
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .distinct()
    )
    return _verify_pairs(cand, ta, tb, n, threshold)


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash near-dup pair graph, keep_id = minimum doc id per component —
    the document-level form of the entity canonicalization the KG pipeline
    runs (operators/canonicalize.py hash-min CC, reused verbatim; the
    reference analog is the MERGE-on-natural-key collapse,
    Neo4j.java:160-173, generalized to fuzzy evidence).

    Pairwise near-dup lists under-serve a training pipeline: to drop
    duplicates you need the transitive grouping (A~B, B~C => one keeper
    for {A,B,C}), and pair-at-a-time dropping is order-dependent. Returns
    (doc_id, keep_id) for every document in a non-trivial cluster; docs
    absent from the output are their own keeper. Scale shape: the CC loop
    runs on the PAIR GRAPH (near-dup edges, orders of magnitude smaller
    than the corpus), converging in O(cluster diameter) rounds.
    """
    from importtoneo4j_spark.operators.canonicalize import connected_components

    pairs = minhash_near_dups(
        df, id_col, text_col, n, num_perm, bands, rows_per_band, threshold, max_bucket
    )
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    comp = connected_components(edges)
    return comp.select(F.col("id").alias("doc_id"), F.col("comp").alias("keep_id"))


def exact_ngram_contamination(
    corpus_train: DataFrame,
    corpus_eval: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    max_df: int = 1000,
) -> DataFrame:
    """Exact-substring decontamination probe: eval documents sharing ANY
    exact token n-gram with any training document — the published
    eval-decontamination practice (13-gram overlap window), complementing
    the fuzzy cross_corpus_overlap.

    Inverted n-gram train x eval join; training-side n-grams with document
    frequency above ``max_df`` are dropped from the index (the same
    drop_hot_buckets economics as every blocking join here: a boilerplate
    13-gram in 10^6 training docs would fan out per eval hit; it also
    carries no contamination signal). Returns one row per contaminated
    eval doc: (eval_id, n_shared_ngrams, n_train_docs).
    """
    def inv(df: DataFrame, alias: str) -> DataFrame:
        # fan_out: the 13-gram explode is narrow (see simhash128)
        return fan_out(
            df.filter(F.size(_tokens(F.col(text_col))) >= n)
        ).select(
            F.col(id_col).alias(alias),
            F.explode(token_ngrams(F.col(text_col), n)).alias("g"),
        )

    train = drop_hot_buckets(inv(corpus_train, "train_id"), max_df, key="g")
    ev = inv(corpus_eval, "eval_id")
    return (
        ev.join(train, "g")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("g").alias("n_shared_ngrams"),
            F.countDistinct("train_id").alias("n_train_docs"),
        )
    )


def simhash128(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, hash_fn: str = "md5"
) -> DataFrame:
    """128-bit SimHash per document as two longs (doc, sim_lo, sim_hi):
    sim_lo carries bits 0-63, sim_hi bits 64-127 — per-bit majority vote
    over the distinct token n-grams' md5 bits (features are n-grams, not
    unigrams: on low-entropy vocabularies every document's unigram SET is
    nearly identical and unigram SimHash degenerates). Using ALL 128 bits
    md5 already produces is what lets the banded blocking use 32-bit band
    values (2^32 key space) instead of 16-bit bands, whose 65,536-key
    ceiling guarantees quadratic bucket blowup past ~10^6 documents.

    Bit convention (mirrored in the DuckDB oracle — md5 hex is identical in
    both engines, the same trick as the MinHash family): word w = bit // 32,
    words = [md5 hex chars 9-16, 1-8, 17-24, 25-32]. hash_fn='xxhash64'
    derives the four words from two salted xxhash64 calls for production
    runs that don't need SQL parity."""
    # fan_out (round 6, guide §2.5): the n-gram explode + 128 bit-votes are
    # narrow; a one-small-file corpus otherwise runs them on one core
    toks = fan_out(
        df.filter(F.size(_tokens(F.col(text_col))) >= n)
    ).select(
        F.col(id_col).alias("doc"),
        F.explode(token_ngrams(F.col(text_col), n)).alias("tok"),
    )
    if hash_fn == "xxhash64":
        h0, h1 = F.xxhash64("tok"), F.xxhash64("tok", F.lit(0x5EED))
        words = [
            h0.bitwiseAND(F.lit(0xFFFFFFFF)),
            F.shiftright(h0, 32).bitwiseAND(F.lit(0xFFFFFFFF)),
            h1.bitwiseAND(F.lit(0xFFFFFFFF)),
            F.shiftright(h1, 32).bitwiseAND(F.lit(0xFFFFFFFF)),
        ]
    else:
        md = F.md5(F.col("tok"))
        words = [
            F.conv(F.substring(md, start, 8), 16, 10).cast("long")
            for start in (9, 1, 17, 25)
        ]
    toks = toks.select("doc", *[w.alias(f"_w{i}") for i, w in enumerate(words)])

    def bit_set(b: int):
        return F.shiftright(F.col(f"_w{b // 32}"), b % 32).bitwiseAND(F.lit(1)) == 1

    votes = [
        F.sum(F.when(bit_set(b), 1).otherwise(-1)).alias(f"v{b}") for b in range(128)
    ]
    agg = toks.groupBy("doc").agg(*votes)

    def assemble(lo_bit: int) -> Column:
        out = None
        for b in range(64):
            mask = F.shiftleft(F.lit(1).cast("long"), b)
            bit = F.when(F.col(f"v{lo_bit + b}") > 0, mask).otherwise(
                F.lit(0).cast("long")
            )
            out = bit if out is None else out.bitwiseOR(bit)
        return out

    return agg.select("doc", assemble(0).alias("sim_lo"), assemble(64).alias("sim_hi"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    hash_fn: str = "md5",
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup pairs with 128-bit Hamming distance <= max_hamming, blocked
    on four 32-bit SimHash bands (pigeonhole: discovery is GUARANTEED for
    d <= 3 — four bands, at most three corrupted; above that recall follows
    the banded-SimHash probability curve, as in every production SimHash
    index), verified with bit_count(xor) on both halves. Use the MinHash-LSH
    path when recall at large radii is the requirement; SimHash is the
    compact, precision-oriented variant (fixed 16-byte state per doc).

    Two scale guards vs the 64-bit/16-bit-band version this replaces:
    * 32-bit band values — key space 2^32 per band instead of 2^16, so
      buckets stay small on high-entropy corpora of any size;
    * drop_hot_buckets(max_bucket) — degenerate content (B exact clones
      collide on all four bands) is capped before the self-join instead of
      emitting B^2 candidate rows. Pairs whose only agreeing band is hot
      are not discovered — the same documented tradeoff as the LSH cap
      (operators/link.py:129).
    """
    s = simhash128(df, id_col, text_col, hash_fn=hash_fn)
    mask32 = F.lit(0xFFFFFFFF)
    band_vals = [
        F.col("sim_lo").bitwiseAND(mask32),
        F.shiftright(F.col("sim_lo"), 32).bitwiseAND(mask32),
        F.col("sim_hi").bitwiseAND(mask32),
        F.shiftright(F.col("sim_hi"), 32).bitwiseAND(mask32),
    ]
    banded = s.select(
        "doc",
        "sim_lo",
        "sim_hi",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{b}|"), v.cast("string"))
                    for b, v in enumerate(band_vals)
                ]
            )
        ).alias("band_key"),
    )
    banded = drop_hot_buckets(banded, max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.sim_lo").alias("la"),
            F.col("a.sim_hi").alias("ha"),
            F.col("b.sim_lo").alias("lb"),
            F.col("b.sim_hi").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
