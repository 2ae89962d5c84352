"""Round-7 optimization harness — per-query isolation on top of bench.py.

bench.py is FROZEN for measurement; this file exists so the optimization
round can (a) time individual queries with warmups+reps without paying the
full 20-minute bench, (b) dump ``.explain("formatted")`` plans into
plans/r07/, and (c) time sub-pieces through the noop sink (guide §1.4).

Usage:
  python bench_extra.py lsh span pipeline        # time query groups
  python bench_extra.py --explain lsh            # dump plans only
  SPARK_GRAFT_BENCH_REPS=3 python bench_extra.py span

Groups mirror bench.py's thunks exactly (same data tables, same actions)
so numbers here predict the frozen bench's in-session tier.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import bench  # noqa: E402  (frozen harness; reused for data + thunks)
from bench import CPUS, REPO, SF_DIR, ensure_span_docs, ensure_neardup_docs  # noqa: E402

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", 1))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))
PLAN_DIR = REPO / "plans" / "r07"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_groups(spark):
    from pyspark.sql import functions as F

    from quake3_log_analyser_spark.operators.dedup import (
        duplicated_spans,
        minhash_lsh_pairs,
        minhash_lsh_pairs_carry,
        strip_spans,
    )
    from quake3_log_analyser_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )
    from quake3_log_analyser_spark.operators.ann import (
        cosine_topk,
        ivf_seed_centroids,
        quantized_cosine_topk,
        semdedup,
    )

    groups: dict[str, dict] = {}

    # --- heavy in-session groups -----------------------------------------
    span_docs = spark.read.parquet(ensure_span_docs(spark))
    groups["span"] = {
        "span_detect": lambda: duplicated_spans(span_docs, n=8).count(),
        "span_strip": lambda: strip_spans(
            span_docs, duplicated_spans(span_docs, n=8)
        ).agg(F.sum(F.length("text"))).collect()[0][0],
    }

    nd_docs = spark.read.parquet(ensure_neardup_docs(spark))
    groups["lsh"] = {
        "lsh_pairs_slim": lambda: minhash_lsh_pairs(
            nd_docs, n=1, n_hashes=16, bands=4, threshold=0.7
        ).count(),
        "lsh_pairs_carry": lambda: minhash_lsh_pairs_carry(
            nd_docs, n=1, n_hashes=16, bands=4, threshold=0.7
        ).count(),
    }

    bm25_terms = ["reserved", "terms", "tail"]
    bm25_idx = bench.ensure_bm25_index(spark, ensure_span_docs(spark))
    groups["bm25"] = {
        "bm25_brute": lambda: bm25_topk(span_docs, bm25_terms, k=10).collect(),
        "bm25_indexed": lambda: bm25_topk_indexed(
            spark, bm25_idx, bm25_terms, k=10
        ).collect(),
    }

    fpath, qpath = bench.ensure_ann_tables(spark, n_vec=1_600_000)
    fvec = spark.read.parquet(fpath)
    qvec = spark.read.parquet(qpath)
    fq = fvec.filter(F.col("vec_id") < 2)
    qq = qvec.filter(F.col("vec_id") < 2)
    groups["ann"] = {
        "ann_brute_f32": lambda: cosine_topk(fvec, fq, k=10)
        .agg(F.count(F.lit(1)))
        .collect(),
        "ann_brute_i8": lambda: quantized_cosine_topk(
            qvec, qq, k=10, pre_quantized=True
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    }

    sd_corpus = (
        fvec.filter(F.col("vec_id") < 25_000)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .repartition(CPUS)
    )
    sd_cent_fine = ivf_seed_centroids(sd_corpus, 512)
    sd_cent_coarse = ivf_seed_centroids(sd_corpus, 128)
    groups["semdedup"] = {
        "semdedup_fine": lambda: semdedup(
            sd_corpus, threshold=0.9, centroids=sd_cent_fine
        )
        .agg(F.count(F.lit(1)))
        .collect(),
        "semdedup_coarse": lambda: semdedup(
            sd_corpus, threshold=0.9, centroids=sd_cent_coarse
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    }

    # --- r6-new corpus ops at 400k docs (r6 verdict Next #7: these had
    # oracle rows but no at-scale cost record; bench.py is frozen, so the
    # measured numbers live here and in OPTIMIZATION_r07.md) -------------
    from quake3_log_analyser_spark.operators.corpus import (
        block_shuffle,
        classifier_score,
        epoch_mixture,
        train_classifier,
    )

    src_docs = span_docs.withColumn(
        "source",
        F.concat(F.lit("s"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string")),
    )
    ep_weights = {"s0": 1.5, "s1": 0.3, "s2": 2.0, "s3": 1.0}
    lab_docs = span_docs.filter(F.col("doc_id") < 20_000).withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("int")
    )
    groups["corpus400k"] = {
        "epoch_mixture_400k": lambda: epoch_mixture(
            src_docs, ep_weights
        ).agg(F.count(F.lit(1)), F.sum("epoch")).collect(),
        "block_shuffle_400k": lambda: block_shuffle(
            span_docs, n_blocks=64
        ).agg(F.count(F.lit(1)), F.max("pos")).collect(),
        "classifier_train_20k": lambda: train_classifier(
            lab_docs, epochs=2
        ).agg(F.count(F.lit(1))).collect(),
        "classifier_score_400k": lambda: classifier_score(
            span_docs,
            spark.range(1000).select(
                F.col("id").alias("bucket"),
                (F.col("id") % 7 / 3.0 - 1.0).alias("weight"),
            ),
        ).agg(F.count(F.lit(1)), F.sum("score")).collect(),
    }

    # --- generic engine queries -------------------------------------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    groups["generic"] = {
        qname: (lambda qn=qname: qs[qn](spark, SF_DIR).collect())
        for qname in ["tpch_q1", "top_customers", "event_gap_sessions"]
    }
    return groups


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    explain_only = "--explain" in sys.argv

    from quake3_log_analyser_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS, shuffle_partitions=CPUS)

    # headline groups come straight from the frozen harness
    head_groups, _meta = bench.build_headline_groups(spark)
    groups = dict(head_groups)
    groups.update(build_groups(spark))

    want = args or list(groups)
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for gname in want:
        group = groups[gname]
        if explain_only:
            continue
        for name, fn in group.items():
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            for _ in range(WARMUPS):
                fn()
        times: dict[str, list[float]] = {n: [] for n in group}
        for _ in range(REPS):
            for name, fn in group.items():
                spark.sparkContext.setJobDescription(name)
                t0 = time.perf_counter()
                fn()
                times[name].append(round(time.perf_counter() - t0, 3))
        for name, ts in times.items():
            s = sorted(ts)
            timings[name] = s[len(s) // 2]
            samples[name] = ts
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"group": gname, "median": {n: timings[n] for n in group},
                          "samples": {n: samples[n] for n in group}}), flush=True)
    print(json.dumps({"medians": timings}))


if __name__ == "__main__":
    main()
