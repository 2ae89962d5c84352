"""BM25 retrieval over the document corpus.

A training-data pipeline uses lexical retrieval constantly: mining
quality documents near a seed set, retrieval-based decontamination
(fetch the corpus neighborhoods of benchmark questions), and building
eval sets.  BM25 (Robertson/Sparck Jones; the Lucene-standard variant
with ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``) is the classic
scoring function.

Two physical shapes:

* ``bm25_topk``         — score against the corpus directly: one explode
  restricted to the (broadcast) query terms, two hash aggregations, a
  distributed ``TakeOrderedAndProject`` top-k.  Right when queries are
  ad-hoc and the corpus is already in memory/cache.
* ``bm25_write_index`` / ``bm25_topk_indexed`` — materialize the
  INVERTED INDEX: per-(term, doc) postings written ``partitionBy`` a
  hash bucket of the term, corpus stats beside them.  A query then
  statically prunes the scan to the buckets its terms hash into
  (``PartitionFilters`` in the plan) — at 10^12 rows the difference
  between scanning the corpus per query batch and scanning
  ``|query terms| / n_buckets`` of it.  The lexical twin of
  ``ann.ivf_write_index``.

Exactness: per-(doc, term) BM25 contributions are rounded to integer
MICRO-units before the per-doc sum (the ``operators.lm`` discipline), so
scores are exact integers — partition-order- and engine-independent; the
DuckDB oracle reproduces them bit-for-bit.  Float literals in the oracle
SQL are emitted with ``repr()`` so both engines parse the identical
double.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def _lower_terms(query_terms: Sequence[str]) -> list[str]:
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one non-blank term")
    return terms


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # NULL text maps to an EMPTY token array before size() is taken: with
    # the session's default ansi=false, size(NULL) is -1 (legacy
    # sizeOfNull), so a coalesce-after-size guard never fires and a NULL
    # row would contribute dl=-1 to sum_dl while still counting in n_docs
    toks = F.coalesce(
        F.transform(ws_tokens(F.col(text_col)), lambda w: F.lower(w)),
        F.array().cast("array<string>"),
    )
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks")).select(
        "doc_id",
        "_toks",
        F.size("_toks").cast("long").alias("dl"),
    )


def _bm25_contrib(k1: float, b: float):
    """Per-(doc, term) BM25 contribution in integer micro-units.

    Arithmetic structure mirrors the oracle SQL exactly (same literal
    values via repr, same association) so the rounded micro value is
    bit-identical across engines; ``ln`` may differ in the last ulp but
    cannot move a value across a .5 micro boundary in practice (the same
    exposure ``operators.lm`` carries)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    tf = F.col("tf").cast("double")
    tfnorm = (tf * (F.lit(1.0) + F.lit(k1))) / (
        tf
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return F.round(idf * tfnorm * F.lit(1e6)).cast("long")


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    Shape: corpus stats are ONE aggregation over per-doc token counts (no
    explode); the explode is immediately filtered to the query terms (a
    tiny ``isin`` literal list — Catalyst keeps it a scan-side predicate),
    so the shuffled volume is O(matching postings), not O(corpus tokens).
    ``df`` per term and the final per-doc sum are hash aggregations;
    the term-level joins broadcast (|query terms| rows and 1 stats row).

    Returns ``(doc_id, n_terms, score_micro)`` — ``n_terms`` the number
    of distinct query terms present, ``score_micro`` the BM25 score in
    exact integer micro-units (see module docstring).
    """
    terms = _lower_terms(query_terms)
    base = _doc_tokens(docs, id_col, text_col)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # filter INSIDE the array before exploding (round-7): the explode of
    # every corpus token generated O(corpus tokens) rows only for the
    # scan-side isin to drop ~all of them; filtering the array first
    # explodes O(matching postings) rows (measured: 2.75 -> 2.0 s on the
    # 400k-doc brute query, identical output)
    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter("_toks", lambda t: t.isin(terms))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", _bm25_contrib(k1, b).alias("c"))
    )
    return contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.sum("c").alias("score_micro"),
    )


def _rank_topk(scores: DataFrame, k: int) -> DataFrame:
    """Global top-k by (score desc, doc_id): ``orderBy + limit`` compiles
    to ``TakeOrderedAndProject`` — per-partition top-k merged on the
    driver, never a single-partition global sort.  The rank window then
    runs over k rows only."""
    top = scores.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 against ``query_terms``.

    ``(doc_id, n_terms, score_micro, rank)``, rank 1-based by
    (score desc, doc_id) — fully deterministic."""
    return _rank_topk(bm25_scores(docs, query_terms, k1, b, id_col, text_col), k)


def bm25_write_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index: postings ``(term, doc_id, tf, dl)``
    written ``partitionBy("bucket")`` where ``bucket =
    pmod(xxhash64(term), n_buckets)``, plus a one-row ``stats`` table
    (``n_docs``, ``sum_dl``).  One full explode + hash-agg — the linear
    one-time build; afterwards every query reads only its terms' buckets
    (``bm25_topk_indexed``).  ``n_buckets`` sizes the pruning grain:
    O(cluster cores) buckets keeps per-bucket files large while a
    10-term query still skips ~``1 - 10/n_buckets`` of the bytes."""
    base = _doc_tokens(docs, id_col, text_col)
    (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        # cluster rows by bucket before the partitioned write: without
        # this every upstream task scatters into every bucket directory
        # (tasks x n_buckets small files); with it each bucket is one
        # task's contiguous output, and sorting by term within the task
        # gives parquet row-group min/max the term locality that makes
        # the query-side term filter skip row groups
        .repartition(F.col("bucket"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{path}/stats"
    )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """``bm25_topk`` against a ``bm25_write_index`` layout — identical
    scores by construction (parity pinned in tests).

    ``n_buckets`` is read from the index's stats sidecar (the writer
    records it), so a query can never hash terms with a bucket count
    that contradicts the files; passing it explicitly only validates.
    The bucket ids of the query terms are computed with a |terms|-row
    Spark job (same xxhash64 the writer used) and embedded as LITERALS,
    so the postings scan carries a static ``PartitionFilters`` on the
    partition column — only the probed buckets' directories are read."""
    terms = _lower_terms(query_terms)
    stats = spark.read.parquet(f"{path}/stats")
    written_buckets = stats.select("n_buckets").first()["n_buckets"]
    if n_buckets is not None and n_buckets != written_buckets:
        raise ValueError(
            f"index at {path} was written with n_buckets={written_buckets}, "
            f"caller claims {n_buckets}"
        )
    n_buckets = written_buckets
    term_rows = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = sorted(
        r["b"]
        for r in term_rows.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats.select("n_docs", "sum_dl")))
        .select("doc_id", _bm25_contrib(k1, b).alias("c"))
    )
    scores = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.sum("c").alias("score_micro"),
    )
    return _rank_topk(scores, k)


def bm25_oracle_sql(
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin of ``bm25_topk`` — same tokenization, same arithmetic
    structure, float literals emitted with ``repr`` so both engines parse
    the identical double."""
    terms = _lower_terms(query_terms)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tok AS (
  SELECT doc_id, CASE WHEN text IS NULL OR length(trim(text)) = 0
                      THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
  FROM {table}
),
base AS (SELECT doc_id, t, len(t) AS dl FROM tok),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
tf AS (
  SELECT doc_id, dl, x AS term, COUNT(*) AS tf
  FROM base, UNNEST(t) AS u(x)
  WHERE x IN ({in_list})
  GROUP BY doc_id, dl, x
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
    CAST(round(
      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * ((CAST(tf.tf AS DOUBLE) * (1.0 + {k1!r}))
         / (CAST(tf.tf AS DOUBLE)
            + {k1!r} * (1.0 - {b!r} + {b!r} * tf.dl
                        / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
      * 1e6) AS BIGINT) AS c
  FROM tf JOIN dft d USING (term), stats s
),
score AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms, SUM(c) AS score_micro
  FROM contrib GROUP BY doc_id
),
r AS (
  SELECT doc_id, n_terms, CAST(score_micro AS BIGINT) AS score_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank
  FROM score
)
SELECT * FROM r WHERE rank <= {int(k)}
"""
