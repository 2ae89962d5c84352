"""BM25 production job — build the inverted index once, query it many
times (``spark-submit --py-files`` launcher; the lexical twin of
``jobs/run_ann.py``).

    zip -r pipeline.zip quake3_log_analyser_spark/
    spark-submit --py-files pipeline.zip jobs/run_bm25.py index \
        --corpus <documents parquet> --index <index base path> \
        [--n-buckets 64] [--id-col doc_id] [--text-col text]
    spark-submit --py-files pipeline.zip jobs/run_bm25.py query \
        --index <index base path> --terms "hash,join,stream" \
        --output <results parquet> [--k 10]

``index`` writes per-(term, doc) postings partitioned by a hash bucket
of the term plus a stats sidecar carrying (n_docs, sum_dl, n_buckets) —
a query can never hash terms with a bucket count contradicting the
files.  ``query`` statically prunes the postings scan to its terms'
buckets and writes ``(doc_id, n_terms, score_micro, rank)``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("index")
    ix.add_argument("--corpus", required=True)
    ix.add_argument("--index", required=True)
    ix.add_argument("--n-buckets", type=int, default=64)
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--text-col", default="text")

    qy = sub.add_parser("query")
    qy.add_argument("--index", required=True)
    qy.add_argument("--terms", required=True, help="comma-separated query terms")
    qy.add_argument("--output", required=True)
    qy.add_argument("--k", type=int, default=10)
    qy.add_argument("--k1", type=float, default=1.2)
    qy.add_argument("--b", type=float, default=0.75)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from quake3_log_analyser_spark.operators.retrieval import (
        bm25_topk_indexed,
        bm25_write_index,
    )
    from quake3_log_analyser_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("bm25-pipeline")

    if args.cmd == "index":
        corpus = spark.read.parquet(args.corpus)
        bm25_write_index(
            corpus, args.index, n_buckets=args.n_buckets,
            id_col=args.id_col, text_col=args.text_col,
        )
        print(f"bm25 index: {args.n_buckets} buckets -> {args.index}")
    else:
        terms = [t for t in args.terms.split(",") if t.strip()]
        out = bm25_topk_indexed(
            spark, args.index, terms, k=args.k, k1=args.k1, b=args.b
        )
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation("bm25_results")
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        out.write.mode("overwrite").parquet(args.output)
        print(f"bm25 query: {obs.get['n']} result rows -> {args.output}")


if __name__ == "__main__":
    main()
