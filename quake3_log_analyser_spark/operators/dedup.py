"""Deduplication operators for training-data pipelines.

Four strategies, each a composition of built-in DataFrame ops (the SimHash
bit-fold is the one Arrow pandas-UDF):

* exact          — hash-groupBy on the normalized-content fingerprint
* unigram/ngram Jaccard — candidate pairs within cheap buckets, verified
                   with set intersection/union
* MinHash + LSH  — shingle -> per-seed min-hash -> banded bucket join ->
                   candidate pairs -> exact-Jaccard verify
* SimHash        — 64-bit near-dup signature; Hamming-close pairs

Scale notes: every strategy is shuffle-by-signature (never all-pairs);
LSH band join is the 100 TB path — candidate generation cost is
O(rows x bands), and AQE handles hot buckets (e.g. boilerplate documents)
via skew-split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint_md5,
    minhash_signature,
    word_ngrams,
    ws_tokens,
)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of documents with identical normalized content."""
    keyed = df.select(
        F.col(id_col).alias("doc_id"), fingerprint_md5(F.col(text_col)).alias("fp")
    )
    return (
        keyed.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup pairs by word n-gram Jaccard.

    Candidates are restricted to same token-count bucket (|a| and |b| within
    ~2x of each other is implied by J >= 0.5); the exact intersect/union
    check runs only inside buckets.  n=1 is unigram Jaccard (oracle-checked
    in DuckDB); n=3 the classic shingle variant.
    """
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.array_distinct(F.transform(ws_tokens(F.col(text_col)), F.lower))
            if n == 1
            else word_ngrams(F.col(text_col), n)
        ).alias("grams"),
    ).filter(F.size("grams") > 0)
    # bucket by log2 of set size: J(a,b) >= t forces |a|/|b| in [t, 1/t],
    # so true pairs land in the same or adjacent bucket
    bucketed = shingled.withColumn(
        "bucket", F.floor(F.log2(F.size("grams"))).cast("int")
    )
    a = bucketed.alias("a")
    joined = None
    # J >= 0.5 forces |a|/|b| within 2x, i.e. same or ADJACENT log2 bucket;
    # doc_id ordering is independent of bucket order, so probe both sides
    for shift in (-1, 0, 1):
        b = bucketed.withColumn("bucket", F.col("bucket") + shift).alias("b")
        j = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
        )
        joined = j if joined is None else joined.unionByName(j)
    pairs = (
        joined.dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("grams_a", "grams_b"))
                / F.size(F.array_union("grams_a", "grams_b"))
            ).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate generation with exact-Jaccard verification.

    signature -> ``bands`` bands of ``n_hashes/bands`` rows; docs sharing
    any band bucket become candidates (collision prob 1-(1-J^r)^b); the
    final Jaccard check removes false positives.  This is the strategy that
    scales: no pairwise work outside shared buckets.
    """
    rows = n_hashes // bands
    shingled = df.select(
        F.col(id_col).alias("doc_id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).filter(F.size("grams") > 0)
    sig = shingled.withColumn("sig", minhash_signature(F.col("grams"), n_hashes))
    banded = sig.select(
        "doc_id",
        "grams",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * rows + 1, rows)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "grams", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cands.select(
        "doc_a",
        "doc_b",
        (
            F.size(F.array_intersect("grams_a", "grams_b"))
            / F.size(F.array_union("grams_a", "grams_b"))
        ).alias("jaccard"),
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (Arrow pandas UDF, numpy bit-fold)."""

    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            toks = t.lower().split()
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = np.int64(np.uint64(hash_token(tok)))
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sig = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("simhash")
    )


def hash_token(tok: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across workers, unlike hash())."""
    h = 0xCBF29CE484222325
    for ch in tok.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Hamming-close SimHash pairs via 4-band exact-match blocking
    (a pair within distance 3 must agree exactly on at least one of four
    16-bit bands — pigeonhole)."""
    sig = simhash(df, text_col, id_col)
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cands.filter(F.col("hamming") <= max_hamming)
