"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline metric: end-to-end transcript-pipeline throughput (turns/sec) for
parse -> sessionize -> aggregate on a deterministic synthetic transcripts
table sized to the scale factor (~3.3 turns per lineitem row, i.e. ~2M
turns at sf0.1).  The transcripts parquet is generated once per sf into
``data/`` and reused.

Env:
  SPARK_GRAFT_SF_DIR  input scale dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores    (default all)

Also measured: the pandas-UDF parser vs the column-expression parser (the
Spark analogue of the reference's split-vs-regex study,
quake3-server-events/benches/parsing_strategies.rs), the extended exact
fold, fan-out routing, and the generic engine queries.

Run ``python scripts/scaling_bench.py`` for the N-vs-4N-cores scaling
evidence (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# transcripts per sf: ~10 turns per orders row (sf0.1 -> ~2.0M turns)
TURNS_PER_CONV = 600


def ensure_transcripts(
    spark, sf_name: str, n_rows_hint: int, hot_conv_factor: int = 8, tag: str = ""
) -> str:
    """Generate (once) and return the path of the bench transcripts table."""
    from quake3_log_analyser_spark.datagen import generate_transcripts

    n_convs = max(64, n_rows_hint // TURNS_PER_CONV)
    path = str(
        REPO / "data" / f"transcripts_{sf_name}_{n_convs}x{TURNS_PER_CONV}{tag}"
    )
    marker = Path(path) / "_SUCCESS"
    if not marker.exists():
        df = generate_transcripts(
            spark,
            n_convs=n_convs,
            turns_per_conv=TURNS_PER_CONV,
            malformed_per_mille=5,
            hot_conv_factor=hot_conv_factor,
            partitions=CPUS * 2,
        )
        df.write.mode("overwrite").parquet(path)
    return path


def ensure_ann_tables(spark, n_vec: int = 400_000, dim: int = 64) -> tuple[str, str]:
    """Generate (once) a float32 embedding corpus and its int8-quantized
    twin.  Deterministic JVM-side synthesis (sin over the row id — no
    driver RNG), so every round benches identical bytes.  The int8 table
    is what a 100 TB ANN corpus would materialize: 3.5× smaller on disk
    (measured: 101 MB vs 29 MB at 400k×64) — the saving is bytes stored
    /scanned/shuffled; local warm-cache compute ties (see the paired
    group below)."""
    from pyspark.sql import functions as F

    from quake3_log_analyser_spark.operators.ann import quantize_int8

    fpath = str(REPO / "data" / f"ann_f32_{n_vec}x{dim}")
    qpath = str(REPO / "data" / f"ann_i8_{n_vec}x{dim}")
    if not (Path(qpath) / "_SUCCESS").exists():
        vecs = spark.range(n_vec, numPartitions=CPUS * 2).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.sin(
                    F.col("id").cast("double") * i.cast("double") * 0.6180339887
                ).cast("float"),
            ).alias("embedding"),
        )
        vecs.write.mode("overwrite").parquet(fpath)
        quantize_int8(spark.read.parquet(fpath)).select(
            "vec_id", "q_embedding", "q_scale"
        ).write.mode("overwrite").parquet(qpath)
    return fpath, qpath


def ensure_span_docs(spark, n_docs: int = 400_000) -> str:
    """Generate (once) the 400k-doc synthetic corpus the span-dedup and
    BM25 benches read.  MATERIALIZED, not generated per scan — measuring
    an operator over an inline generator frame re-runs the 16M-xxhash64
    synthesis inside every scan and times the generator, not the operator.

    Per-doc pseudo-random tokens: doc bodies share NO grams (xxhash64 mix
    on (doc_id, position) — an AFFINE mix here makes doc A a shifted copy
    of doc B whenever a*(idA-idB) = b*shift mod p, and every doc matches),
    so only the injected boilerplate tail is cross-document-duplicated —
    span detection sees realistic selectivity, and the boilerplate tokens
    give BM25 query terms at two selectivities (10% and 90% of docs)."""
    from pyspark.sql import functions as F

    path = str(REPO / "data" / f"span_docs_{n_docs // 1000}k")
    if not (Path(path) / "_SUCCESS").exists():
        spark.range(n_docs, numPartitions=CPUS * 2).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(36)),
                        lambda i: F.concat(
                            F.lit("w"),
                            F.pmod(F.xxhash64(F.col("id"), i), F.lit(999983))
                            .cast("string"),
                        ),
                    ),
                ),
                F.when(
                    F.col("id") % 10 == 0,
                    F.lit(
                        " all rights reserved subject to the site terms of use"
                    ),
                ).otherwise(F.lit(" tail")),
            ).alias("text"),
        ).write.mode("overwrite").parquet(path)
    return path


def ensure_bm25_index(spark, docs_path: str, n_buckets: int = 64) -> str:
    """Build (once) the bucket-partitioned BM25 inverted index over the
    span-docs corpus — the one-time linear build ``bm25_topk_indexed``
    amortizes."""
    from quake3_log_analyser_spark.operators.retrieval import bm25_write_index

    path = str(REPO / "data" / f"bm25_idx_400k_b{n_buckets}")
    if not (Path(path) / "stats" / "_SUCCESS").exists():
        bm25_write_index(spark.read.parquet(docs_path), path, n_buckets=n_buckets)
    return path


def ensure_bucketed(spark, tpath: str, n_buckets: int = 32) -> str:
    """Bucketed + sorted twin of the bench table: the sessionize window
    reads it with NO shuffle and NO sort (SURVEY.md §4 scale lever).

    Location and table name carry ``n_buckets`` so differently-bucketed
    twins of the same table never register a DDL whose bucket count
    contradicts the files (the previous bare ``_bucketed`` suffix let a
    64-bucket caller claim a 32-bucket directory)."""
    from quake3_log_analyser_spark.schemas import TRANSCRIPT_SCHEMA

    suffix = f"_bucketed{n_buckets}"
    loc = tpath + suffix
    tbl = f"bench_transcripts{suffix}"
    ddl_cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in TRANSCRIPT_SCHEMA)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    if not (Path(loc) / "_SUCCESS").exists():
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(tpath)
        (
            df.repartition(n_buckets, "conv_id")
            .write.mode("overwrite")
            .bucketBy(n_buckets, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .option("path", loc)
            .saveAsTable(tbl)
        )
    else:
        spark.sql(
            f"CREATE TABLE {tbl} ({ddl_cols}) USING parquet "
            f"CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) "
            f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
        )
    return tbl


def main() -> None:
    from pyspark.sql import functions as F

    from quake3_log_analyser_spark.session import get_spark
    from quake3_log_analyser_spark.operators.parse import parse_transcripts
    from quake3_log_analyser_spark.operators.sessionize import sessionize
    from quake3_log_analyser_spark.operators.summarize import summarize_kills_only
    from quake3_log_analyser_spark.plans.pipeline import (
        full_pipeline_ops,
        summarize_matches,
    )
    from quake3_log_analyser_spark.schemas import TRANSCRIPT_SCHEMA
    import __spark_entry__ as entrymod

    sf_name = Path(SF_DIR).name
    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)

    orders_rows = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    tpath = ensure_transcripts(spark, sf_name, orders_rows * 10)
    transcripts = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(tpath)
    n_turns = transcripts.count()

    timings: dict[str, float] = {}

    # Measurement protocol (BENCH/BASELINE.md: this VM shows 1.5-2x
    # run-to-run drift): TWO warm-up runs per query — the first eats
    # codegen/JIT, the second eats page-cache/JIT tail — then the MEDIAN of
    # three timed runs.  Median (not best) is robust to a single calm or
    # contended window, which is what broke round-over-round comparability
    # in rounds 1-2.  EVERY query rides an interleaved group (round-5): a
    # query whose reps run consecutively can read +40-70% purely from
    # landing in a contended session window.
    WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", 2))
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))

    def bench_paired(group: dict, reps: int = REPS):
        """Interleaved paired measurement for plan VARIANTS of the same
        work: warm every variant, then run rounds A/B/C/A/B/C... and take
        per-variant medians.  In-session drift (page cache, governor, JIT
        tiers) then hits all variants equally instead of whichever ran
        last — the round-3 artifact showed the bucketed plan 22% slower
        than adhoc purely from sequential drift while targeted interleaved
        runs showed it faster; the drift-robust protocol belongs IN the
        committed artifact (scripts/scaling_bench.py already measured
        scaling pairs this way)."""
        results = {}
        for name, fn in group.items():
            for _ in range(WARMUPS):
                results[name] = fn()
        times = {name: [] for name in group}
        for _ in range(reps):
            for name, fn in group.items():
                t0 = time.perf_counter()
                results[name] = fn()
                times[name].append(time.perf_counter() - t0)
        for name, ts in times.items():
            ts.sort()
            timings[name] = round(ts[len(ts) // 2], 3)
        return results

    # headline: parse -> sessionize -> per-match aggregate (kills-only path)
    def run_pipeline():
        out = summarize_matches(transcripts, ops={"kills"})
        return out.agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("total_kills").alias("kills"),
        ).collect()[0]

    # GLOBAL warm-up: the first measured query otherwise eats the whole
    # JVM/VM settling window (JIT, page cache, governor) — observed as the
    # first query reading 1.5-2x its steady state even with its own two
    # per-query warm-ups
    for _ in range(2):
        run_pipeline()

    # bucketed + raw-session-first variant: shuffle-free, sort-free window
    btbl = ensure_bucketed(spark, tpath)
    bucketed = spark.table(btbl)

    def run_pipeline_bucketed():
        out = summarize_matches(bucketed, ops={"kills"}, session_first=True)
        return out.agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("total_kills").alias("kills"),
        ).collect()[0]

    # skew posture (north rule): ONE conversation holds ~10% of all turns.
    # The skew lands on the sessionize window (partitionBy conv_id — a
    # co-location requirement AQE cannot split), so this measures the
    # straggler cost relative to the uniform table above.  hot_conv_factor
    # f gives conv0 f*TURNS turns of base+ (f-1)*TURNS total: f = base/(9*TURNS).
    n_convs = max(64, orders_rows * 10 // TURNS_PER_CONV)
    hot_factor = max(2, n_convs // 9)
    skew_path = ensure_transcripts(
        spark, sf_name, orders_rows * 10, hot_conv_factor=hot_factor, tag="_skew"
    )
    skewed = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(skew_path)
    n_skew_turns = skewed.count()

    def run_pipeline_skewed():
        out = summarize_matches(skewed, ops={"kills"})
        return out.agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("total_kills").alias("kills"),
        ).collect()[0]

    # single-pass multi-op vectorized summary (round-4: ONE scan + ONE
    # shuffle for kills+means+scores; the old branch-join form re-ran the
    # parse+window DAG per aggregate branch)
    def run_pipeline_multiop():
        return summarize_matches(
            transcripts, ops={"kills", "means_of_death", "reported_scores"}
        ).agg(F.count(F.lit(1))).collect()

    # the plan variants of the SAME headline work are measured interleaved
    # (A/B/C/D rounds, median per variant) — drift-robust; multiop rides
    # the same group so the 3-op-vs-1-op overhead is a same-window read
    paired = bench_paired(
        {
            "pipeline_kills": run_pipeline,
            "pipeline_kills_bucketed": run_pipeline_bucketed,
            "pipeline_kills_skewed": run_pipeline_skewed,
            "pipeline_multiop": run_pipeline_multiop,
        }
    )
    head = paired["pipeline_kills"]
    skew_hot_share = round(hot_factor * TURNS_PER_CONV / n_skew_turns, 3)

    # parser comparison (reference: split vs regex, 3200x — ours: JVM
    # expressions vs Arrow pandas UDF).  Interleaved: the round-4 artifact
    # showed +40% on parse_arrow purely from sequential in-session drift.
    def run_parse(parser):
        def _f():
            return (
                parse_transcripts(transcripts, parser=parser)
                .agg(F.count("event_type").alias("n"))
                .collect()[0]["n"]
            )
        return _f

    bench_paired(
        {
            "parse_arrow": run_parse("arrow"),
            "parse_pandas": run_parse("pandas"),
            "parse_expr": run_parse("expr"),
        }
    )

    # the three grouped-map / fan-out pipelines ride one interleaved group:
    # not plan variants of identical work, but pairing spreads each query's
    # reps across the session window so a +47%/+71% artifact move (round-4
    # pipeline_extended/route_sinks) is a real regression, not drift
    from quake3_log_analyser_spark.operators.translate import translate
    from quake3_log_analyser_spark.presentation import render_conv_reports
    from quake3_log_analyser_spark.operators.route import write_sinks

    sink_dir = str(REPO / "data" / f"sinks_{sf_name}")
    bench_paired(
        {
            # extended exact fold (applyInPandas per conv)
            "pipeline_extended": lambda: summarize_matches(
                transcripts, ops=full_pipeline_ops()
            ).agg(F.count(F.lit(1))).collect(),
            # distributed JSON reports (exact fold + reference-format
            # renderer, one grouped-map per conversation)
            "json_report": lambda: render_conv_reports(
                translate(parse_transcripts(transcripts))
            ).agg(F.count(F.lit(1)), F.sum(F.length("report"))).collect(),
            # fan-out routing (writes all five sinks; disk-bound)
            "route_sinks": lambda: write_sinks(
                sessionize(parse_transcripts(transcripts)), sink_dir
            ),
        }
    )

    # hot-fingerprint dedup (viral-boilerplate skew): ONE text duplicated
    # into 25% of an 8M-row table, so the survivor join-back's SMJ puts
    # every copy of that fingerprint in one task unless AQE's skew-join
    # splits it at runtime.  Paired AQE-on vs skew-split-off so the rescue
    # is MEASURED (at 16M rows: 9.2 s vs 11.2 s).  Full salting
    # (dedup_survivors(salts=8)) is deliberately NOT benchmarked at this
    # scale: the keepers side is one row per DISTINCT fingerprint — corpus-
    # sized at low dup rates — and salts x replication through the shuffle
    # regresses catastrophically (measured: timeout at 16M rows); see
    # operators/skew.py for when explicit salting does apply.
    from quake3_log_analyser_spark.operators.dedup import dedup_survivors

    n_hot, n_uniq = 2_000_000, 6_000_000
    hot_docs = spark.range(n_hot + n_uniq).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot, F.lit("the same viral boilerplate text")
        )
        .otherwise(F.concat(F.lit("unique document "), F.col("id").cast("string")))
        .alias("text"),
    )

    def dedup_hot_aqe_off():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            return dedup_survivors(hot_docs).count()
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    bench_paired(
        {
            "dedup_hot": lambda: dedup_survivors(hot_docs).count(),
            "dedup_hot_noskewaqe": dedup_hot_aqe_off,
        }
    )

    # cross-document repeated-substring spans (round-5): 400k docs x ~46
    # tokens (~18M gram windows through explode -> doc-freq agg -> join-
    # back -> interval merge), 10% carrying a shared 10-token boilerplate
    # tail.  span_detect is detection only; span_strip adds the span
    # join-back + JVM token filter over the full corpus.
    from quake3_log_analyser_spark.operators.dedup import (
        duplicated_spans,
        strip_spans,
    )

    span_docs = spark.read.parquet(ensure_span_docs(spark))

    def span_detect():
        return duplicated_spans(span_docs, n=8).count()

    def span_strip():
        sp = duplicated_spans(span_docs, n=8)
        return strip_spans(span_docs, sp).agg(
            F.sum(F.length("text"))
        ).collect()[0][0]

    bench_paired({"span_detect": span_detect, "span_strip": span_strip})

    # BM25 brute vs inverted-index over the same 400k-doc corpus and the
    # same 3-term query (terms at 10%/10%/90% doc frequency).  The brute
    # path tokenizes the corpus per query; the indexed path reads only
    # the query terms' bucket directories of the prebuilt postings
    # (static partition pruning) — the pruning claim, measured.
    from quake3_log_analyser_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )

    bm25_terms = ["reserved", "terms", "tail"]
    bm25_idx = ensure_bm25_index(spark, ensure_span_docs(spark))
    bench_paired(
        {
            "bm25_brute": lambda: bm25_topk(span_docs, bm25_terms, k=10).collect(),
            "bm25_indexed": lambda: bm25_topk_indexed(
                spark, bm25_idx, bm25_terms, k=10
            ).collect(),
        }
    )

    # float32 vs int8 brute-force ANN: identical top-k work over the same
    # 1.6M x 64 vectors, one table materialized as float arrays (~400 MB
    # parquet), the twin pre-quantized to int8 at "ingest" (~115 MB —
    # 3.5x smaller, the measured storage/wire claim).  MEASURED RESULT on
    # this box: the pair TIES (~3.8 vs ~4.0 s at 2 queries; 9.1 vs 9.4 s
    # at 16 queries over 400k) — both tables sit in page cache, so
    # array-decode + dot-product compute dominates and the byte saving
    # is invisible locally.  The int8 win is the 3.5x fewer bytes
    # scanned/shuffled, which pays on cold object-storage reads and
    # cross-node shuffles, NOT local arithmetic — kept paired in the
    # artifact so the claim stays honest round over round.
    from quake3_log_analyser_spark.operators.ann import (
        cosine_topk,
        quantized_cosine_topk,
    )

    fpath, qpath = ensure_ann_tables(spark, n_vec=1_600_000)
    fvec = spark.read.parquet(fpath)
    qvec = spark.read.parquet(qpath)
    fq = fvec.filter(F.col("vec_id") < 2)
    qq = qvec.filter(F.col("vec_id") < 2)
    bench_paired(
        {
            "ann_brute_f32": lambda: cosine_topk(fvec, fq, k=10)
            .agg(F.count(F.lit(1)))
            .collect(),
            "ann_brute_i8": lambda: quantized_cosine_topk(
                qvec, qq, k=10, pre_quantized=True
            )
            .agg(F.count(F.lit(1)))
            .collect(),
        }
    )

    # generic engine queries on the sf tables (one interleaved group:
    # every query in the artifact is now either paired or fresh-JVM)
    qs = entrymod.queries()
    bench_paired(
        {
            qname: (lambda qn=qname: qs[qn](spark, SF_DIR).collect())
            for qname in ["tpch_q1", "top_customers", "event_gap_sessions"]
        }
    )

    pipeline_sec = timings["pipeline_kills"]
    best_sec = min(pipeline_sec, timings.get("pipeline_kills_bucketed", pipeline_sec))
    turns_per_sec = round(n_turns / best_sec) if best_sec > 0 else 0
    print(
        json.dumps(
            {
                "metric": "transcript_pipeline_e2e_seconds",
                "value": pipeline_sec,
                "unit": "sec",
                "queries": timings,
                "sf": sf_name,
                "n_turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "n_matches": head["n_matches"],
                "cpus": CPUS,
                "protocol": f"{WARMUPS} warmups + median of {REPS}",
                "skew_hot_share": skew_hot_share,
            }
        )
    )


if __name__ == "__main__":
    main()
