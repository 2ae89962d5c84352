"""Idempotent resume + per-partition lineage/metrics (north_rule).

The reference is a one-shot CLI with no restart story; at 10^12-turn scale
a run must be resumable and auditable.  Design:

* **Work units** are source partitions (or conv_id bucket ranges).  A run
  processes only units absent from the checkpoint table, so re-running
  after a failure never double-writes (idempotent resume; on Iceberg this
  is snapshot-based — `snapshot-id` recorded per commit and the job
  restarts from the last committed snapshot).
* **Lineage + metrics**: one checkpoint row per (run_id, unit) with input
  rows, parse errors, matches completed, and wall time — written AFTER the
  unit's sink writes commit (write-ahead ordering: sinks first, then the
  checkpoint row; a crash between the two re-processes one unit into an
  overwritten partition directory, which is idempotent).

Local implementation uses a parquet checkpoint table + per-unit
``partitionBy`` overwrite (dynamic partition overwrite keeps reruns
idempotent); the Iceberg variant is the same logic over snapshot commits.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("unit", T.StringType(), False),
        T.StructField("n_input_rows", T.LongType(), True),
        T.StructField("n_parse_errors", T.LongType(), True),
        T.StructField("n_matches", T.LongType(), True),
        T.StructField("wall_sec", T.DoubleType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)


def committed_units(spark: SparkSession, checkpoint_path: str) -> set[str]:
    try:
        rows = spark.read.parquet(checkpoint_path).select("unit").distinct().collect()
        return {r["unit"] for r in rows}
    except Exception:
        return set()


def commit_unit(
    spark: SparkSession,
    checkpoint_path: str,
    run_id: str,
    unit: str,
    metrics: dict,
) -> None:
    row = [
        (
            run_id,
            unit,
            int(metrics.get("n_input_rows", 0)),
            int(metrics.get("n_parse_errors", 0)),
            int(metrics.get("n_matches", 0)),
            float(metrics.get("wall_sec", 0.0)),
        )
    ]
    df = spark.createDataFrame(
        row,
        "run_id string, unit string, n_input_rows long, n_parse_errors long, "
        "n_matches long, wall_sec double",
    ).withColumn("committed_at", F.current_timestamp())
    df.write.mode("append").parquet(checkpoint_path)


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_base: str,
    checkpoint_path: str,
    run_id: str,
    n_units: int = 16,
) -> list[str]:
    """Process the table in conv_id-hash units, skipping committed ones.

    Returns the list of units processed in this invocation.  Calling it a
    second time on the same inputs is a no-op (idempotent resume); killing
    it between units and re-running completes only the remainder.
    """
    from ..operators.parse import parse_transcripts
    from ..operators.sessionize import sessionize
    from ..operators.summarize import summarize_kills_only

    done = committed_units(spark, checkpoint_path)
    processed = []
    unit_col = F.pmod(F.xxhash64("conv_id"), F.lit(n_units))
    for u in range(n_units):
        unit = f"convhash={u}"
        if unit in done:
            continue
        t0 = time.perf_counter()
        part = transcripts.filter(unit_col == u)
        sess = sessionize(parse_transcripts(part)).persist()
        try:
            summaries = summarize_kills_only(sess)
            # per-unit directory => overwrite is idempotent on re-run
            summaries.write.mode("overwrite").parquet(f"{out_base}/summaries/{unit}")
            stats = sess.agg(
                F.count(F.lit(1)).alias("rows"),
                F.count("parse_error_kind").alias("errs"),
                F.sum(F.col("is_match_end").cast("long")).alias("matches"),
            ).collect()[0]
        finally:
            sess.unpersist()
        commit_unit(
            spark, checkpoint_path, run_id, unit,
            {
                "n_input_rows": stats["rows"],
                "n_parse_errors": stats["errs"],
                "n_matches": stats["matches"] or 0,
                "wall_sec": time.perf_counter() - t0,
            },
        )
        processed.append(unit)
    return processed
