"""Production corpus-cleaning job — ``spark-submit --py-files`` launcher.

    zip -r pipeline.zip quake3_log_analyser_spark/
    spark-submit --py-files pipeline.zip jobs/run_corpus.py \
        --input  <documents parquet path> \
        --output <output base path> \
        --checkpoint <checkpoint table path> \
        --run-id corpus-2024-06-01 [--resume] [--verbose] \
        [--ops dedup,span_dedup,gate,lm_gate,classifier_gate,pii,\
               decontaminate,repetition_gate,neardup,sample,epoch,\
               chunk,pack,shuffle] \
        [--benchmark <eval-set parquet path>] \
        [--min-quality 0.45] [--langs en] [--salts 8] \
        [--lm-min-avg-logp -7.0] [--lm-ref <reference-corpus parquet path>]

Runs the selected corpus stages (exact dedup, quality/language gate,
trigram-LM perplexity gate, PII
redaction, benchmark decontamination, repetition gating, MinHash-LSH
near-dup removal, deterministic sampling, epoch upsampling, chunking,
sequence packing, deterministic training-order shuffle — the full op
menu of
plans/corpus_run.py, mirroring the reference CLI's operation menu,
app/src/main.rs:86-97) with stage-level checkpoint/resume and per-stage
lineage + row metrics — the same observability the match pipeline's
``jobs/run_pipeline.py`` has.  ``--resume`` skips committed stages and
picks up from the last stage's materialized output; resuming under a
changed ``--ops`` menu or changed tunables raises instead of mixing
configurations.  ``--salts`` routes the exact-dedup survivor join-back
through the explicit salted join for viral-boilerplate fingerprints.
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
    ap.add_argument("--ops", default="dedup,gate,neardup",
                    help="comma-separated stage menu (canonical order "
                         "enforced): dedup,span_dedup,gate,lm_gate,"
                         "classifier_gate,pii,decontaminate,"
                         "repetition_gate,neardup,sample,epoch,chunk,"
                         "pack,shuffle")
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet path (required by decontaminate)")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument("--lm-min-avg-logp", type=float, default=-7.0,
                    help="lm_gate threshold: min mean per-trigram ln-prob")
    ap.add_argument("--lm-ref", default=None,
                    help="parquet of reference docs to train the lm_gate "
                         "model on (default: the stage input itself)")
    ap.add_argument("--span-n", type=int, default=8,
                    help="span_dedup: word n-gram window size (detection "
                         "floor for repeated substrings)")
    ap.add_argument("--span-min-docs", type=int, default=2,
                    help="span_dedup: min distinct docs sharing a window")
    ap.add_argument("--classifier-weights", default=None,
                    help="(bucket, weight) parquet for classifier_gate "
                         "(mutually exclusive with --classifier-train)")
    ap.add_argument("--classifier-train", default=None,
                    help="labeled docs parquet to TRAIN the classifier "
                         "gate on in-Spark (train_classifier; mutually "
                         "exclusive with --classifier-weights)")
    ap.add_argument("--classifier-label-col", default="label")
    ap.add_argument("--classifier-epochs", type=int, default=3)
    ap.add_argument("--classifier-lr", type=float, default=1.0)
    ap.add_argument("--classifier-min-score", type=float, default=0.5)
    ap.add_argument("--classifier-buckets", type=int, default=1 << 18)
    ap.add_argument("--classifier-ngram", type=int, default=1)
    ap.add_argument("--classifier-bias", type=float, default=0.0)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allowed language guesses")
    ap.add_argument("--shingle-n", type=int, default=1)
    ap.add_argument("--n-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--survivorship", choices=("greedy", "cc"), default="greedy",
                    help="near-dup drop rule: greedy keep-min per pair, or "
                         "cluster-exact connected components")
    ap.add_argument("--decontam-n", type=int, default=8,
                    help="word n-gram size for decontamination")
    ap.add_argument("--decontam-min-hits", type=int, default=1)
    ap.add_argument("--max-dup-line-ratio", type=float, default=0.3)
    ap.add_argument("--sample-rate", type=float, default=None,
                    help="sample stage: uniform deterministic hash-sample "
                         "rate in [0, 1]")
    ap.add_argument("--mixture", default=None,
                    help="sample stage: per-source rates, e.g. "
                         "'commoncrawl=0.3,books=1.0' (mutually exclusive "
                         "with --sample-rate)")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--default-rate", type=float, default=0.0,
                    help="rate for sources absent from --mixture")
    ap.add_argument("--epochs", default=None,
                    help="epoch stage: per-source upsampling epochs (may "
                         "exceed 1.0), e.g. 'wikipedia=2.5,commoncrawl=0.3'")
    ap.add_argument("--default-epochs", type=float, default=0.0,
                    help="epochs for sources absent from --epochs")
    ap.add_argument("--shuffle-blocks", type=int, default=64,
                    help="shuffle stage: hash blocks of the deterministic "
                         "training-order permutation (1-256)")
    ap.add_argument("--chunk-tokens", type=int, default=128)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--bin-tokens", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=1,
                    help="independent packing shards (O(cluster cores))")
    ap.add_argument("--seed", type=int, default=0)
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
        ops=tuple(s for s in args.ops.split(",") if s),
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        lm_min_avg_logp=args.lm_min_avg_logp,
        lm_ref_path=args.lm_ref,
        span_n=args.span_n,
        span_min_docs=args.span_min_docs,
        classifier_weights_path=args.classifier_weights,
        classifier_train_path=args.classifier_train,
        classifier_label_col=args.classifier_label_col,
        classifier_epochs=args.classifier_epochs,
        classifier_lr=args.classifier_lr,
        classifier_min_score=args.classifier_min_score,
        classifier_n_buckets=args.classifier_buckets,
        classifier_ngram=args.classifier_ngram,
        classifier_bias=args.classifier_bias,
        n=args.shingle_n, n_hashes=args.n_hashes,
        bands=args.bands, threshold=args.threshold,
        survivorship=args.survivorship,
        benchmark_path=args.benchmark,
        decontam_n=args.decontam_n,
        decontam_min_hits=args.decontam_min_hits,
        max_dup_line_ratio=args.max_dup_line_ratio,
        sample_rate=args.sample_rate,
        mixture_weights=(
            {
                kv.split("=", 1)[0]: float(kv.split("=", 1)[1])
                for kv in args.mixture.split(",")
                if kv
            }
            if args.mixture
            else None
        ),
        source_col=args.source_col,
        default_rate=args.default_rate,
        epoch_weights=(
            {
                kv.split("=", 1)[0]: float(kv.split("=", 1)[1])
                for kv in args.epochs.split(",")
                if kv
            }
            if args.epochs
            else None
        ),
        default_epochs=args.default_epochs,
        shuffle_blocks=args.shuffle_blocks,
        chunk_tokens=args.chunk_tokens, overlap=args.overlap,
        bin_tokens=args.bin_tokens, n_shards=args.n_shards,
        seed=args.seed,
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
