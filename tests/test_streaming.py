"""Streaming variant: per-conv keyed state across micro-batches must
reproduce the batch pipeline's summaries exactly (same fold core)."""

from __future__ import annotations

import time

import pytest

from quake3_log_analyser_spark.plans.pipeline import summarize_matches
from quake3_log_analyser_spark.schemas import TRANSCRIPT_SCHEMA
from quake3_log_analyser_spark.sources.transcripts import transcripts_from_file
from quake3_log_analyser_spark.streaming.session_stream import (
    summarize_matches_stream,
)
from tests.conftest import FIXTURES_BLL

FULL = frozenset({"kills", "means_of_death", "player_resolutions", "reported_scores"})


def test_streaming_matches_batch(spark, tmp_path):
    path = FIXTURES_BLL / "discrepant.log"
    if not path.exists():
        pytest.skip("reference fixture unavailable")
    t = transcripts_from_file(spark, str(path), "discrepant")

    # two files written in turn order -> two (or more) micro-batches with
    # state carried across; the match spans both chunks
    half = 300
    src = tmp_path / "stream_src"
    t.filter(f"turn_idx <= {half}").coalesce(1).write.mode("overwrite").parquet(
        str(src / "p1")
    )
    time.sleep(1.1)
    t.filter(f"turn_idx > {half}").coalesce(1).write.mode("append").parquet(
        str(src / "p1")
    )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "p1"))
    )
    out = summarize_matches_stream(stream, ops=FULL)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_summaries")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM stream_summaries").collect()
    want = summarize_matches(t, ops=FULL).collect()

    def norm(rows):
        return sorted(
            (
                r["conv_id"], r["match_id"], r["total_kills"],
                tuple(r["players"] or []),
                tuple((k["player"], k["frags"]) for k in (r["kills"] or [])),
                tuple((m["mean"], m["count"]) for m in (r["kills_by_means"] or [])),
                tuple((s["player"], s["frags"]) for s in (r["game_reported_scores"] or [])),
                r["graceful"], r["error"],
            )
            for r in rows
        )

    assert norm(got) == norm(want)
    assert len(got) == 1 and got[0]["total_kills"] == 105
