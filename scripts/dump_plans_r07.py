"""Dump ``explain("formatted")`` for every bench query touched in round 7.

Usage: python scripts/dump_plans_r07.py <repo_root> <out_dir> <suffix>

Run once against the round-start tree (suffix ``before``) and once against
HEAD (suffix ``after``); the judge checks plan claims in
OPTIMIZATION_r07.md against these files.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

ROOT, OUT, SUFFIX = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, ROOT)

import bench  # noqa: E402
from bench import CPUS, SF_DIR, ensure_neardup_docs, ensure_span_docs  # noqa: E402

from quake3_log_analyser_spark.session import get_spark  # noqa: E402

spark = get_spark("plans-r07", cpus=CPUS, shuffle_partitions=CPUS)
from pyspark.sql import functions as F  # noqa: E402

out_dir = Path(OUT)
out_dir.mkdir(parents=True, exist_ok=True)


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    (out_dir / f"{name}_{SUFFIX}.txt").write_text(buf.getvalue())
    print("dumped", name, flush=True)


from quake3_log_analyser_spark.operators.dedup import (  # noqa: E402
    dedup_survivors,
    duplicated_spans,
    minhash_lsh_pairs,
    minhash_lsh_pairs_carry,
    strip_spans,
)
from quake3_log_analyser_spark.operators.retrieval import bm25_topk  # noqa: E402
from quake3_log_analyser_spark.operators.ann import (  # noqa: E402
    cosine_topk,
    ivf_seed_centroids,
    quantized_cosine_topk,
    semdedup,
)

from quake3_log_analyser_spark.plans.pipeline import summarize_matches  # noqa: E402
from quake3_log_analyser_spark.schemas import TRANSCRIPT_SCHEMA  # noqa: E402

orders_rows = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
tpath = bench.ensure_transcripts(spark, Path(SF_DIR).name, orders_rows * 10)
transcripts = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(tpath)
dump(
    "pipeline_multiop",
    summarize_matches(
        transcripts, ops={"kills", "means_of_death", "reported_scores"}
    ),
)

nd_docs = spark.read.parquet(ensure_neardup_docs(spark))
dump("lsh_pairs_slim", minhash_lsh_pairs(nd_docs, n=1, n_hashes=16, bands=4, threshold=0.7))
dump("lsh_pairs_carry", minhash_lsh_pairs_carry(nd_docs, n=1, n_hashes=16, bands=4, threshold=0.7))

span_docs = spark.read.parquet(ensure_span_docs(spark))
sp = duplicated_spans(span_docs, n=8)
dump("span_detect", sp)
dump("span_strip", strip_spans(span_docs, duplicated_spans(span_docs, n=8)))

dump("bm25_brute", bm25_topk(span_docs, ["reserved", "terms", "tail"], k=10))

fpath, qpath = bench.ensure_ann_tables(spark, n_vec=1_600_000)
fvec = spark.read.parquet(fpath)
qvec = spark.read.parquet(qpath)
dump("ann_brute_f32", cosine_topk(fvec, fvec.filter(F.col("vec_id") < 2), k=10))
dump(
    "ann_brute_i8",
    quantized_cosine_topk(
        qvec, qvec.filter(F.col("vec_id") < 2), k=10, pre_quantized=True
    ),
)

sd_corpus = (
    fvec.filter(F.col("vec_id") < 25_000)
    .select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    .repartition(CPUS)
)
sd_cent = ivf_seed_centroids(sd_corpus, 512)
dump("semdedup_fine", semdedup(sd_corpus, threshold=0.9, centroids=sd_cent))

spark.stop()
