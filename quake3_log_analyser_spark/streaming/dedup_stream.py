"""Streaming exact deduplication: the unbounded-ingest twin of
``operators/dedup.py::exact_duplicates``.

A live corpus feed (crawler output, transcript firehose) re-delivers the
same document — retries, at-least-once sources, mirrored crawls.  The
batch pipeline collapses those with a fingerprint groupBy; a stream
cannot hold every fingerprint ever seen, so the production contract is
**dedup within a bounded event-time horizon**: two copies arriving within
the watermark window collapse to one, and fingerprint state older than
the watermark is evicted so the state store stays bounded forever.

Spark-first shape: ``withWatermark(ts) +
dropDuplicatesWithinWatermark([fp])`` — the built-in stateful operator
(Spark 3.5+) keeps one row per key in the state store, drops later
arrivals of the same key while the key is live, and reclaims the key once
the watermark passes its event time.  Unlike ``dropDuplicates``, state
cannot grow without bound; unlike a keyed ``applyInPandasWithState``
re-implementation, it needs no Python in the hot path at all.

The emitted row is the FIRST arrival (the survivor rule a downstream
exact-dedup batch job also applies per micro-batch boundary); the
fingerprint is the same normalized-content md5 the batch operators key
on, so a batch backfill and the streaming path agree on what "the same
document" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from quake3_log_analyser_spark.functions.text import fingerprint_md5


def dedup_stream(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
    fp_col: str = "fp",
) -> DataFrame:
    """Drop re-deliveries of the same normalized content within the
    event-time watermark horizon.

    Returns the input columns plus ``fp_col`` (kept so downstream exact
    dedup across horizon boundaries can reuse it without re-hashing).
    Works on batch frames too (Spark runs the same operator with a full
    horizon), which is what the batch-parity test pins.
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

    with_fp = docs_stream.withColumn(fp_col, fingerprint_md5(docs_stream[text_col]))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [fp_col]
    )
