"""Resumable production run of the corpus-cleaning pipeline.

The match pipeline's resume story (plans/checkpoint.py) partitions work by
``conv_id`` hash because conversations are independent.  Corpus cleaning is
NOT row-decomposable that way — a duplicate pair can span any two doc
partitions (exact dedup groups by global fingerprint, LSH by global band
bucket) — so the resume unit here is the STAGE, the standard posture for a
100 TB data build where each stage materializes its output anyway:

  1. ``dedup``   — exact-duplicate removal -> ``{out}/deduped``
  2. ``gate``    — quality + language filter -> ``{out}/gated``
  3. ``neardup`` — MinHash-LSH near-dup drop -> ``{out}/cleaned``

Each stage writes its parquet output FIRST and appends one lineage row to
the checkpoint table AFTER (write-ahead ordering, same as the match
pipeline): a crash between the two re-runs only that stage, whose
``overwrite`` write is idempotent.  A resumed run reads the previous
stage's committed output from disk instead of recomputing it.

Lineage rows reuse CHECKPOINT_SCHEMA with the documented column mapping
``n_input_rows`` = rows into the stage, ``n_matches`` = rows kept by the
stage (``n_parse_errors`` unused, 0).  Both counts ride the stage's own
write job via ``df.observe`` — zero extra scans.

The composition is semantically identical to ``operators.corpus.
clean_corpus`` (same defaults, same greedy keep-min rule) — pinned by a
pytest that diffs the CLI output against the library call, plus the
driver's ★clean_corpus oracle on the library form.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .checkpoint import commit_unit, committed_units

STAGES = ("dedup", "gate", "neardup")


def _run_stage(
    spark: SparkSession,
    name: str,
    out_df: DataFrame,
    obs_in: Observation,
    obs_out: Observation,
    out_path: str,
    checkpoint_path: str,
    run_id: str,
) -> None:
    t0 = time.perf_counter()
    out_df.write.mode("overwrite").parquet(out_path)
    commit_unit(
        spark,
        checkpoint_path,
        run_id,
        f"stage={name}",
        {
            "n_input_rows": obs_in.get["n"] or 0,
            "n_parse_errors": 0,
            "n_matches": obs_out.get["n"] or 0,
            "wall_sec": time.perf_counter() - t0,
        },
    )


def run_corpus_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_base: str,
    checkpoint_path: str,
    run_id: str,
    min_quality: float = 0.45,
    langs: tuple[str, ...] = ("en",),
    n: int = 1,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    salts: int = 1,
    resume: bool = True,
) -> list[str]:
    """Run the uncommitted stages; returns the stages processed this call.

    With ``resume=True``, calling it again on the same inputs is a no-op
    (idempotent resume); killing it between a stage's data write and its
    checkpoint append re-runs exactly that stage.  ``resume=False``
    processes ALL stages regardless of prior commits (a fresh run over the
    same checkpoint table — lineage rows still append under the new
    run_id, stage outputs are overwritten).
    """
    from ..functions.text import lang_guess, quality_score
    from ..operators.dedup import dedup_survivors, minhash_lsh_pairs

    done = committed_units(spark, checkpoint_path) if resume else set()
    processed: list[str] = []

    def count_obs(df: DataFrame, label: str):
        obs = Observation(label)
        return df.observe(obs, F.count(F.lit(1)).alias("n")), obs

    deduped_path = f"{out_base}/deduped"
    if "stage=dedup" not in done:
        d, obs_in = count_obs(docs, "corpus_dedup_in")
        removed = dedup_survivors(d, text_col, id_col, salts=salts).select(
            F.col("doc_id").alias(id_col)
        )
        survivors, obs_out = count_obs(
            d.join(removed, id_col, "left_anti"), "corpus_dedup_out"
        )
        _run_stage(
            spark, "dedup", survivors, obs_in, obs_out,
            deduped_path, checkpoint_path, run_id,
        )
        processed.append("stage=dedup")

    gated_path = f"{out_base}/gated"
    if "stage=gate" not in done:
        survivors, obs_in = count_obs(
            spark.read.parquet(deduped_path), "corpus_gate_in"
        )
        gated, obs_out = count_obs(
            survivors.select(
                F.col(id_col),
                F.col(text_col),
                F.round(quality_score(F.col(text_col)), 4).alias("quality"),
                lang_guess(F.col(text_col)).alias("lang_guess"),
            ).filter(
                (F.col("quality") >= min_quality)
                & F.col("lang_guess").isin(list(langs))
            ),
            "corpus_gate_out",
        )
        _run_stage(
            spark, "gate", gated, obs_in, obs_out,
            gated_path, checkpoint_path, run_id,
        )
        processed.append("stage=gate")

    if "stage=neardup" not in done:
        gated, obs_in = count_obs(spark.read.parquet(gated_path), "corpus_near_in")
        near = minhash_lsh_pairs(
            gated, text_col, id_col,
            n=n, n_hashes=n_hashes, bands=bands, threshold=threshold,
        )
        dropped = near.select(F.col("doc_b").alias(id_col)).distinct()
        cleaned, obs_out = count_obs(
            gated.join(dropped, id_col, "left_anti").select(
                id_col, "quality", "lang_guess"
            ),
            "corpus_near_out",
        )
        _run_stage(
            spark, "neardup", cleaned, obs_in, obs_out,
            f"{out_base}/cleaned", checkpoint_path, run_id,
        )
        processed.append("stage=neardup")

    return processed
