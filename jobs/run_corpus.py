"""Production corpus-cleaning job — ``spark-submit --py-files`` launcher.

    zip -r pipeline.zip quake3_log_analyser_spark/
    spark-submit --py-files pipeline.zip jobs/run_corpus.py \
        --input  <documents parquet path> \
        --output <output base path> \
        --checkpoint <checkpoint table path> \
        --run-id corpus-2024-06-01 [--resume] [--verbose] \
        [--min-quality 0.45] [--langs en] [--salts 8]

Runs exact dedup -> quality/language gate -> MinHash-LSH near-dup removal
(the ``clean_corpus`` composition) with stage-level checkpoint/resume and
per-stage lineage + row metrics — the same observability the match
pipeline's ``jobs/run_pipeline.py`` has.  ``--resume`` skips committed
stages and picks up from the last stage's materialized output.
``--salts`` routes the exact-dedup survivor join-back through the explicit
salted join for viral-boilerplate fingerprints.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", default=f"corpus-{int(time.time())}")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allowed language guesses")
    ap.add_argument("--shingle-n", type=int, default=1)
    ap.add_argument("--n-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--salts", type=int, default=1,
                    help=">1 salts the exact-dedup survivor join-back "
                         "(hot-fingerprint skew)")
    ap.add_argument("--verbose", action="store_true",
                    help="print per-stage lineage rows (rows in/kept, wall)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from quake3_log_analyser_spark.plans.corpus_run import run_corpus_resumable
    from quake3_log_analyser_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("corpus-pipeline")
    docs = spark.read.parquet(args.input)

    stages = run_corpus_resumable(
        spark, docs, args.output, args.checkpoint,
        run_id=args.run_id,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        n=args.shingle_n, n_hashes=args.n_hashes,
        bands=args.bands, threshold=args.threshold,
        salts=args.salts,
        resume=args.resume,
    )
    print(f"corpus run {args.run_id}: processed {stages or 'nothing (all committed)'}")
    if args.verbose:
        ck = spark.read.parquet(args.checkpoint)
        ck = ck.filter(ck.run_id == args.run_id)
        for r in sorted(ck.collect(), key=lambda r: r["committed_at"]):
            print(
                f"corpus_stage {r['unit']}: rows_in={r['n_input_rows']} "
                f"rows_kept={r['n_matches']} wall={r['wall_sec']:.2f}s "
                f"(run {r['run_id']})"
            )


if __name__ == "__main__":
    main()
