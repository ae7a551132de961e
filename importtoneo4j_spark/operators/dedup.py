"""Document deduplication family — the training-data-pipeline operators.

* exact_dedup          — content-hash groupBy, keep-min-id (HashSet dedup,
                         reference VariantDatabase.java:357, generalized)
* ngram_jaccard_pairs  — exact near-dup pairs via inverted-index self-join
                         on token n-gram shingles (quadratic in bucket size;
                         fine when shingles are high-entropy)
* minhash_near_dups    — MinHash-LSH blocking + exact-Jaccard verification;
                         the 100 TB path (md5-based, oracle-identical in SQL)
* simhash_near_dups    — 64-bit SimHash with banded blocking + Hamming
                         verification; all native expressions (xxhash64 +
                         bit ops), no UDF
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from importtoneo4j_spark.functions.text import jaccard, minhash_bands_agg
from importtoneo4j_spark.session import stage_persist


def _tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def token_ngrams(text_col: Column, n: int = 5) -> Column:
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest id per distinct content hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, threshold: float = 0.5
) -> DataFrame:
    sh = df.filter(F.size(_tokens(F.col(text_col))) >= n).select(
        F.col(id_col).alias("doc"), token_ngrams(F.col(text_col), n).alias("sh")
    )
    inv = sh.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(b, "s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jac", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jac") >= threshold)
        .select("a_id", "b_id", "jac")
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
) -> DataFrame:
    sh = df.filter(F.size(_tokens(F.col(text_col))) >= n).select(
        F.col(id_col).alias("doc"), token_ngrams(F.col(text_col), n).alias("sh")
    )
    # materialize once: sh feeds the signature AND both verification joins,
    # sig feeds both sides of the band self-join — without this each alias
    # recomputes the full shingle+minhash subplan (measured ~4x cost).
    # Persist mode is profile-dependent (SPARK_GRAFT_PERSIST): eager
    # localCheckpoint locally, DISK_ONLY on a cluster where lineage
    # recovery matters — see session.stage_persist / SCALE.md.
    sh = stage_persist(sh)
    sig = stage_persist(minhash_bands_agg(sh, "doc", "sh", num_perm, bands, rows_per_band))
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .distinct()
    )
    return (
        cand.join(sh.select(F.col("doc").alias("a_id"), F.col("sh").alias("sa")), "a_id")
        .join(sh.select(F.col("doc").alias("b_id"), F.col("sh").alias("sb")), "b_id")
        .withColumn("jac", jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("jac") >= threshold)
        .select("a_id", "b_id", "jac")
    )


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
) -> DataFrame:
    """Train/test contamination check: near-duplicate pairs ACROSS two
    corpora (never within either) — the question every training pipeline
    must answer before holding out an eval set.

    Same MinHash-LSH machinery as minhash_near_dups, but the band join is
    A x B instead of a self-join: candidate cost is bounded by cross-bucket
    products only, and a 10^9-doc training corpus never pairs with itself.
    Returns (a_id from corpus_a, b_id from corpus_b, jac >= threshold).
    """
    def prep(df: DataFrame) -> DataFrame:
        sh = df.filter(F.size(_tokens(F.col(text_col))) >= n).select(
            F.col(id_col).alias("doc"), token_ngrams(F.col(text_col), n).alias("sh")
        )
        return stage_persist(sh)

    sha, shb = prep(corpus_a), prep(corpus_b)
    siga = minhash_bands_agg(sha, "doc", "sh", num_perm, bands, rows_per_band)
    sigb = minhash_bands_agg(shb, "doc", "sh", num_perm, bands, rows_per_band)
    cand = (
        siga.alias("a")
        .join(sigb.alias("b"), "band_key")
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .distinct()
    )
    return (
        cand.join(sha.select(F.col("doc").alias("a_id"), F.col("sh").alias("sa")), "a_id")
        .join(shb.select(F.col("doc").alias("b_id"), F.col("sh").alias("sb")), "b_id")
        .withColumn("jac", jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("jac") >= threshold)
        .select("a_id", "b_id", "jac")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, hash_fn: str = "md5"
) -> DataFrame:
    """64-bit SimHash per document: per-bit majority vote over a 64-bit hash
    of the distinct token n-grams. One explode + one wide aggregation, all
    codegen'd. Features are n-grams, not unigrams: on low-entropy vocabularies
    every document's unigram SET is nearly identical and unigram SimHash
    degenerates (all hashes collide).

    hash_fn='md5' (default) derives the 64 bits from the first 16 hex chars
    of md5 as two 32-bit halves — md5 hex is identical in Spark and DuckDB,
    which is what makes the whole near-dup query oracle-checkable in plain
    SQL (same trick as the MinHash family, functions/text.py:96-99).
    hash_fn='xxhash64' keeps the cheaper JVM-native hash for production runs
    that don't need SQL parity."""
    toks = df.filter(F.size(_tokens(F.col(text_col))) >= n).select(
        F.col(id_col).alias("doc"),
        F.explode(token_ngrams(F.col(text_col), n)).alias("tok"),
    )

    def bitmask(b: int):
        # shiftleft stays in the JVM's signed long domain (bit 63 would
        # overflow a Python-literal F.lit)
        return F.shiftleft(F.lit(1).cast("long"), b)

    if hash_fn == "xxhash64":
        toks = toks.withColumn("h", F.xxhash64("tok"))

        def bit_set(b: int):
            return F.col("h").bitwiseAND(bitmask(b)) != 0

    else:  # md5: bits 0-31 from hex chars 9-16 ("lo"), 32-63 from 1-8 ("hi")
        md = F.md5(F.col("tok"))
        toks = toks.select(
            "doc",
            F.conv(F.substring(md, 1, 8), 16, 10).cast("long").alias("_hi"),
            F.conv(F.substring(md, 9, 8), 16, 10).cast("long").alias("_lo"),
        )

        def bit_set(b: int):
            part = F.col("_lo") if b < 32 else F.col("_hi")
            return F.shiftright(part, b % 32).bitwiseAND(F.lit(1)) == 1

    votes = [
        F.sum(F.when(bit_set(b), 1).otherwise(-1)).alias(f"v{b}") for b in range(64)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, bitmask(b)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("doc", sim.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming, blocked on
    16-bit SimHash bands (a pair within distance d < bands must agree on at
    least one band — pigeonhole), verified with bit_count(xor)."""
    s = simhash(df, id_col, text_col, hash_fn=hash_fn)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = s.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}|"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
