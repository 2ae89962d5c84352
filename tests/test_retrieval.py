"""BM25 retrieval: hand-computed scores, index/brute parity, pruning."""

import math

import pytest
from pyspark.sql import functions as F

from quake3_log_analyser_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    bm25_topk_indexed,
    bm25_write_index,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "cat cat dog"),
    (3, "dog runs"),
    (4, ""),
]


def _expected_micro(tf, df, dl, n_docs, sum_dl, k1=1.2, b=0.75):
    """Pure-Python replica of the per-(doc, term) contribution; positive,
    so half-up rounding is floor(x + 0.5)."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    avgdl = sum_dl / n_docs
    tfnorm = (tf * (1.0 + k1)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return math.floor(idf * tfnorm * 1e6 + 0.5)


def test_bm25_scores_hand_computed(spark):
    d = spark.createDataFrame(CORPUS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["score_micro"])
        for r in bm25_scores(d, ["cat", "dog"]).collect()
    }
    # N=4 docs (blank doc counts), sum_dl=11; df(cat)=df(dog)=2
    exp = {
        1: (1, _expected_micro(1, 2, 6, 4, 11)),
        2: (2, _expected_micro(2, 2, 3, 4, 11) + _expected_micro(1, 2, 3, 4, 11)),
        3: (1, _expected_micro(1, 2, 2, 4, 11)),
    }
    assert got == exp  # doc 4 matches nothing and is absent


def test_bm25_topk_rank_and_ties(spark):
    d = spark.createDataFrame(CORPUS, "doc_id int, text string")
    rows = bm25_topk(d, ["cat", "dog"], k=2).collect()
    assert [r["rank"] for r in rows] == [1, 2]
    # doc 2 holds both terms with tf(cat)=2 -> highest score
    assert rows[0]["doc_id"] == 2 and rows[0]["n_terms"] == 2
    # identical docs tie on score; doc_id breaks the tie deterministically
    t = spark.createDataFrame(
        [(10, "x y"), (7, "x y"), (9, "z")], "doc_id int, text string"
    )
    tied = bm25_topk(t, ["x"], k=2).collect()
    assert [r["doc_id"] for r in tied] == [7, 10]
    assert tied[0]["score_micro"] == tied[1]["score_micro"]


def test_bm25_query_term_normalization(spark):
    d = spark.createDataFrame(CORPUS, "doc_id int, text string")
    a = sorted(map(tuple, bm25_scores(d, ["CAT", "cat", " dog "]).collect()))
    # upper-case and duplicate terms collapse; absent terms contribute 0 rows
    b = sorted(map(tuple, bm25_scores(d, ["cat", "dog", "absentterm"]).collect()))
    assert a == b
    with pytest.raises(ValueError):
        bm25_scores(d, ["", "   "])


def test_bm25_indexed_matches_brute_and_prunes(spark, tmp_path):
    d = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 5} common w{i % 3}") for i in range(200)],
        "doc_id int, text string",
    )
    terms = ["common", "w1", "w4"]
    brute = sorted(map(tuple, bm25_topk(d, terms, k=10).collect()))

    path = str(tmp_path / "bm25_idx")
    bm25_write_index(d, path, n_buckets=16)
    # n_buckets rides the index's stats sidecar: omitted -> read back,
    # contradicting -> refused (config-drift guard)
    indexed = bm25_topk_indexed(spark, path, terms, k=10)
    assert sorted(map(tuple, indexed.collect())) == brute
    with pytest.raises(ValueError, match="n_buckets=16"):
        bm25_topk_indexed(spark, path, terms, k=10, n_buckets=8)

    # static partition pruning: the postings scan must carry the bucket
    # IN-list as a PartitionFilter (inputFiles() can't show this — it
    # lists the FileIndex before partition filters apply)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln and "bucket" in ln
    ]
    assert scan_lines, f"no partition filter on the postings scan:\n{plan}"
    allowed = {
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b"))
        .collect()
    }
    # the IN-list literals in the filter are exactly the probed buckets
    in_part = scan_lines[0].split("bucket")[-1]
    assert all(str(b) in in_part for b in allowed), scan_lines[0]


def test_bm25_job_cli_index_then_query(spark, tmp_path):
    """jobs/run_bm25.py: index + query subcommands round-trip and match
    the library brute-force scorer."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))
    import run_bm25

    d = spark.createDataFrame(CORPUS, "doc_id int, text string")
    docs_path = str(tmp_path / "docs")
    d.write.mode("overwrite").parquet(docs_path)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "res")

    run_bm25.main(["index", "--corpus", docs_path, "--index", idx,
                   "--n-buckets", "8"])
    run_bm25.main(["query", "--index", idx, "--terms", "cat, dog",
                   "--output", out, "--k", "3"])
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    exp = sorted(map(tuple, bm25_topk(d, ["cat", "dog"], k=3).collect()))
    assert got == exp


def test_bm25_topk_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition top-k merged on the driver), never a single-partition
    global sort of the scored set."""
    d = spark.createDataFrame(CORPUS, "doc_id int, text string")
    plan = (
        bm25_topk(d, ["cat", "dog"], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_deterministic_under_repartition(spark):
    d = spark.createDataFrame(
        [(i, f"a{i % 11} b{i % 13} shared") for i in range(300)],
        "doc_id int, text string",
    )
    one = sorted(map(tuple, bm25_topk(d, ["shared", "a3"], k=15).collect()))
    two = sorted(
        map(tuple, bm25_topk(d.repartition(17), ["shared", "a3"], k=15).collect())
    )
    assert one == two
