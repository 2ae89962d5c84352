"""Resumable production run of the corpus-cleaning pipeline.

The match pipeline's resume story (plans/checkpoint.py) partitions work by
``conv_id`` hash because conversations are independent.  Corpus cleaning is
NOT row-decomposable that way — a duplicate pair can span any two doc
partitions (exact dedup groups by global fingerprint, LSH by global band
bucket) — so the resume unit here is the STAGE, the standard posture for a
100 TB data build where each stage materializes its output anyway.

The stage menu is configurable (``ops``), mirroring the reference CLI's
operation menu (app/src/main.rs:86-97) and the match pipeline's ``--ops``:

  dedup           exact-duplicate removal            -> ``{out}/deduped``
  span_dedup      cross-doc repeated-substring strip
                  (duplicated_spans + strip_spans)   -> ``{out}/span_deduped``
  gate            quality + language filter          -> ``{out}/gated``
  lm_gate         CCNet-style trigram-LM perplexity
                  filter (model trained on
                  ``lm_ref_path`` or, when None, on
                  the stage input itself)            -> ``{out}/lm_gated``
  classifier_gate hashed n-gram linear classifier
                  (fastText-style; weight table from
                  ``classifier_weights_path`` OR
                  trained in-Spark on the labeled
                  docs at ``classifier_train_path``) -> ``{out}/classifier_gated``
  pii             email/URL/IPv4 redaction in text   -> ``{out}/pii_redacted``
  decontaminate   drop docs sharing n-grams with a
                  benchmark/eval set                 -> ``{out}/decontaminated``
  repetition_gate drop docs above a dup-line ratio   -> ``{out}/repetition_gated``
  neardup         MinHash-LSH near-dup drop          -> ``{out}/cleaned``
  sample          deterministic hash/mixture sample  -> ``{out}/sampled``
  epoch           upsampling mixture (weights > 1.0,
                  floor(e) copies + hash-gated
                  fractional copy); rewrites the id
                  to ``<id>@<epoch>`` so every copy
                  keeps a distinct deterministic
                  identity for downstream chunk/pack
                  hashing (copies interleave instead
                  of packing back-to-back)           -> ``{out}/upsampled``
  chunk           fixed-token overlapping windows    -> ``{out}/chunks``
  pack            token-budget bin assignment        -> ``{out}/packed``
  shuffle         deterministic training-order
                  permutation: adds ``(block, pos)``
                  over the preceding stage's rows
                  (docs, chunks, or packed bins)     -> ``{out}/shuffled``

Stages always execute in the canonical order above regardless of the order
``ops`` lists them; each stage reads the PREVIOUS selected stage's
committed parquet.  ``text`` flows through every filter stage so any
suffix of the menu (chunk/pack, or a downstream tokenizer) still has the
content; ``pack`` packs chunks when ``chunk`` precedes it, else whole
documents.

Each stage writes its parquet output FIRST and appends one lineage row to
the checkpoint table AFTER (write-ahead ordering, same as the match
pipeline): a crash between the two re-runs only that stage, whose
``overwrite`` write is idempotent.  A resumed run reads the previous
stage's committed output from disk instead of recomputing it.

Two marker rows guard resume correctness (the ``_check_ops_marker``
pattern from plans/checkpoint.py): ``ops=...`` pins the stage menu, and
``params=<hash>`` pins the stage-relevant tunables (thresholds, bands,
chunk sizes, ...).  Resuming a checkpoint with a different menu or
different parameters raises instead of silently mixing old-parameter
intermediate outputs into the new run.

Lineage rows reuse CHECKPOINT_SCHEMA with the documented column mapping
``n_input_rows`` = rows into the stage, ``n_matches`` = rows kept by the
stage (``n_parse_errors`` unused, 0).  Both counts ride the stage's own
write job via ``df.observe`` — zero extra scans.

The dedup->gate->neardup composition is semantically identical to
``operators.corpus.clean_corpus`` (same defaults, same greedy keep-min
rule) — pinned by a pytest that diffs the CLI output against the library
call, plus the driver's ★clean_corpus oracle on the library form.
"""

from __future__ import annotations

import hashlib
import json
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .checkpoint import commit_unit, commit_units, committed_units

# canonical execution order; ``ops`` selects a subset of these
STAGES = (
    "dedup",
    "span_dedup",
    "gate",
    "lm_gate",
    "classifier_gate",
    "pii",
    "decontaminate",
    "repetition_gate",
    "neardup",
    "sample",
    "epoch",
    "chunk",
    "pack",
    "shuffle",
)
DEFAULT_OPS = ("dedup", "gate", "neardup")

_STAGE_DIRS = {
    "dedup": "deduped",
    "span_dedup": "span_deduped",
    "gate": "gated",
    "lm_gate": "lm_gated",
    "classifier_gate": "classifier_gated",
    "pii": "pii_redacted",
    "decontaminate": "decontaminated",
    "repetition_gate": "repetition_gated",
    "neardup": "cleaned",
    "sample": "sampled",
    "epoch": "upsampled",
    "chunk": "chunks",
    "pack": "packed",
    "shuffle": "shuffled",
}


def _params_marker(params: dict) -> str:
    """``params=<12-hex>`` — a stable fingerprint of every tunable that
    changes a stage's OUTPUT.  Committed to the checkpoint alongside the
    ops marker so a resume under different parameters raises instead of
    mixing old-parameter stage outputs into the new run (the bug class
    ``_check_ops_marker`` exists to prevent for the op menu)."""
    blob = json.dumps(params, sort_keys=True, default=str)
    return "params=" + hashlib.sha256(blob.encode()).hexdigest()[:12]


def _latest_marker(
    spark: SparkSession, checkpoint_path: str, prefix: str
):
    """``(marker, committed_at)`` of the MOST RECENT run that pinned this
    prefix, or ``(None, None)``.

    A ``resume=False`` re-run over an existing checkpoint is allowed to
    change configuration (its ``overwrite`` writes supersede every stage
    output on disk), so older markers are history, not constraints: only
    the latest-committed marker describes the outputs a resume would read.
    Validating against the full distinct marker set instead (the round-5
    form) permanently disabled resume after any reconfigured fresh run —
    the prior set then held two distinct markers and could never equal
    the requested one.
    """
    try:
        rows = (
            spark.read.parquet(checkpoint_path)
            .filter(F.col("unit").startswith(prefix))
            .orderBy(F.col("committed_at").desc(), F.col("unit"))
            .select("unit", "committed_at")
            .limit(1)
            .collect()
        )
    except Exception:
        return None, None
    if not rows:
        return None, None
    return rows[0]["unit"], rows[0]["committed_at"]


def _check_marker(marker: str, latest: str | None, where: str) -> None:
    if latest is not None and latest != marker:
        raise ValueError(
            f"checkpoint {where} was last committed with {latest!r} but "
            f"this run requests {marker!r}; resuming would mix "
            "configurations across stages — use a fresh checkpoint/"
            "output, the latest configuration, or resume=False"
        )


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
    ops: tuple[str, ...] = DEFAULT_OPS,
    min_quality: float = 0.45,
    langs: tuple[str, ...] = ("en",),
    lm_min_avg_logp: float = -7.0,
    lm_ref_path: str | None = None,
    span_n: int = 8,
    span_min_docs: int = 2,
    classifier_weights_path: str | None = None,
    classifier_train_path: str | None = None,
    classifier_label_col: str = "label",
    classifier_epochs: int = 3,
    classifier_lr: float = 1.0,
    classifier_min_score: float = 0.5,
    classifier_n_buckets: int = 1 << 18,
    classifier_ngram: int = 1,
    classifier_bias: float = 0.0,
    n: int = 1,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.6,
    survivorship: str = "greedy",
    benchmark_path: str | None = None,
    decontam_n: int = 8,
    decontam_min_hits: int = 1,
    max_dup_line_ratio: float = 0.3,
    sample_rate: float | None = None,
    mixture_weights: dict[str, float] | None = None,
    source_col: str = "source",
    default_rate: float = 0.0,
    epoch_weights: dict[str, float] | None = None,
    default_epochs: float = 0.0,
    shuffle_blocks: int = 64,
    chunk_tokens: int = 128,
    overlap: int = 16,
    bin_tokens: int = 2048,
    n_shards: int = 1,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salts: int = 1,
    resume: bool = True,
) -> list[str]:
    """Run the uncommitted stages of ``ops``; returns the stages processed.

    With ``resume=True``, calling it again on the same inputs is a no-op
    (idempotent resume); killing it between a stage's data write and its
    checkpoint append re-runs exactly that stage.  ``resume=False``
    processes ALL selected stages regardless of prior commits (a fresh run
    over the same checkpoint table — lineage rows still append under the
    new run_id, stage outputs are overwritten).  A reconfigured fresh run
    SUPERSEDES the prior configuration: it pins new marker rows, and
    subsequent resumes validate against (and trust stage rows from) the
    latest pin only.  Resuming under a menu or tunables different from
    the latest pin raises (marker rows).
    """
    from ..functions.text import lang_guess, quality_score, redact_pii
    from ..operators.corpus import (
        block_shuffle,
        contaminated_docs,
        epoch_mixture,
        hash_sample,
        mixture_sample,
        repetition_stats,
    )
    from ..operators.lm import lm_gate, train_char_lm
    from ..operators.corpus import classifier_score
    from ..operators.dedup import (
        dedup_survivors,
        duplicated_spans,
        minhash_lsh_pairs,
        neardup_survivors_cc,
        strip_spans,
    )
    from ..operators.pack import chunk_documents, pack_sequences

    if survivorship not in ("greedy", "cc"):
        raise ValueError(
            f"survivorship must be 'greedy' or 'cc', got {survivorship!r}"
        )

    selected = tuple(s for s in STAGES if s in ops)
    unknown = set(ops) - set(STAGES)
    if unknown:
        raise ValueError(f"unknown corpus stages {sorted(unknown)}; know {STAGES}")
    if not selected:
        raise ValueError("ops selects no stages")
    if "decontaminate" in selected and benchmark_path is None:
        raise ValueError("decontaminate stage needs benchmark_path")
    if "classifier_gate" in selected and (
        (classifier_weights_path is None) == (classifier_train_path is None)
    ):
        raise ValueError(
            "classifier_gate stage needs exactly one of "
            "classifier_weights_path (offline-trained weight table) or "
            "classifier_train_path (labeled docs to train on in-Spark)"
        )
    if "sample" in selected:
        if (sample_rate is None) == (mixture_weights is None):
            raise ValueError(
                "sample stage needs exactly one of sample_rate (uniform "
                "hash sampling) or mixture_weights (per-source rates)"
            )
    if "epoch" in selected and epoch_weights is None:
        raise ValueError(
            "epoch stage needs epoch_weights (per-source epoch counts, "
            "may exceed 1.0)"
        )

    ops_marker = "ops=" + ",".join(selected)
    params_marker = _params_marker(
        {
            "min_quality": min_quality,
            "langs": tuple(langs),
            "lm_min_avg_logp": lm_min_avg_logp,
            "lm_ref_path": lm_ref_path,
            "span_n": span_n,
            "span_min_docs": span_min_docs,
            "classifier_weights_path": classifier_weights_path,
            "classifier_train_path": classifier_train_path,
            "classifier_label_col": classifier_label_col,
            "classifier_epochs": classifier_epochs,
            "classifier_lr": classifier_lr,
            "classifier_min_score": classifier_min_score,
            "classifier_n_buckets": classifier_n_buckets,
            "classifier_ngram": classifier_ngram,
            "classifier_bias": classifier_bias,
            "n": n,
            "n_hashes": n_hashes,
            "bands": bands,
            "threshold": threshold,
            "survivorship": survivorship,
            "benchmark_path": benchmark_path,
            "decontam_n": decontam_n,
            "decontam_min_hits": decontam_min_hits,
            "max_dup_line_ratio": max_dup_line_ratio,
            "sample_rate": sample_rate,
            "mixture_weights": (
                tuple(sorted(mixture_weights.items()))
                if mixture_weights is not None
                else None
            ),
            "source_col": source_col,
            "default_rate": default_rate,
            "epoch_weights": (
                tuple(sorted(epoch_weights.items()))
                if epoch_weights is not None
                else None
            ),
            "default_epochs": default_epochs,
            "shuffle_blocks": shuffle_blocks,
            "chunk_tokens": chunk_tokens,
            "overlap": overlap,
            "bin_tokens": bin_tokens,
            "n_shards": n_shards,
            "seed": seed,
            "id_col": id_col,
            "text_col": text_col,
            "salts": salts,
        }
    )
    committed = committed_units(spark, checkpoint_path)
    latest_ops, _ = _latest_marker(spark, checkpoint_path, "ops=")
    latest_params, marker_ts = _latest_marker(spark, checkpoint_path, "params=")
    # the configuration pin must be refreshed whenever the LATEST pin
    # differs (not merely when this config never appeared in history):
    # a config-A -> config-B -> config-A sequence of fresh runs must leave
    # A as the latest pin, or resuming A's outputs would raise against B
    need_pin = latest_ops != ops_marker or latest_params != params_marker
    done: set[str] = set()
    if resume:
        _check_marker(ops_marker, latest_ops, checkpoint_path)
        _check_marker(params_marker, latest_params, checkpoint_path)
        if marker_ts is None:
            done = committed
        else:
            # only stage rows committed at/after the LATEST configuration
            # pin count as done: a reconfigured resume=False run that
            # crashed mid-way leaves older-config stage rows behind, and
            # trusting them would resume over stale on-disk outputs
            done = {
                r["unit"]
                for r in spark.read.parquet(checkpoint_path)
                .filter(F.col("committed_at") >= F.lit(marker_ts))
                .select("unit")
                .distinct()
                .collect()
            }

    processed: list[str] = []

    def count_obs(df: DataFrame, label: str):
        obs = Observation(label)
        return df.observe(obs, F.count(F.lit(1)).alias("n")), obs

    def transform(stage: str, inp: DataFrame) -> DataFrame:
        if stage == "dedup":
            removed = dedup_survivors(inp, text_col, id_col, salts=salts).select(
                F.col("doc_id").alias(id_col)
            )
            return inp.join(removed, id_col, "left_anti")
        if stage == "span_dedup":
            spans = duplicated_spans(
                inp, n=span_n, min_docs=span_min_docs,
                id_col=id_col, text_col=text_col,
            ).withColumnRenamed("doc_id", id_col)
            return strip_spans(inp, spans, id_col=id_col, text_col=text_col)
        if stage == "gate":
            return inp.select(
                F.col(id_col),
                F.col(text_col),
                F.round(quality_score(F.col(text_col)), 4).alias("quality"),
                lang_guess(F.col(text_col)).alias("lang_guess"),
            ).filter(
                (F.col("quality") >= min_quality)
                & F.col("lang_guess").isin(list(langs))
            )
        if stage == "lm_gate":
            # model trained on the reference corpus when given, else on
            # the stage input itself (self-training still separates
            # gibberish from the corpus's own bulk statistics); either
            # way the model is tiny and broadcast by lm_gate.  Docs with
            # < 3 normalized chars have no trigrams and are dropped —
            # nothing to attest fluency (documented in operators/lm.py).
            ref = (
                spark.read.parquet(lm_ref_path) if lm_ref_path else inp
            )
            model = train_char_lm(ref, text_col=text_col)
            return lm_gate(
                inp, model, lm_min_avg_logp, id_col=id_col, text_col=text_col
            )
        if stage == "classifier_gate":
            if classifier_weights_path is not None:
                weights = spark.read.parquet(classifier_weights_path)
            else:
                # in-Spark training on the labeled reference set: the
                # trainer's epoch loop runs EAGERLY here (bounded jobs,
                # one broadcast join + two hash-aggs per epoch) and the
                # resulting weight table is tiny — same model/features as
                # the scorer by construction (operators.corpus.
                # train_classifier)
                from ..operators.corpus import train_classifier

                weights = train_classifier(
                    spark.read.parquet(classifier_train_path),
                    label_col=classifier_label_col,
                    n_buckets=classifier_n_buckets,
                    n=classifier_ngram,
                    epochs=classifier_epochs,
                    lr=classifier_lr,
                    id_col=id_col,
                    text_col=text_col,
                )
            keep = (
                classifier_score(
                    inp, weights,
                    n_buckets=classifier_n_buckets, n=classifier_ngram,
                    bias=classifier_bias, id_col=id_col, text_col=text_col,
                )
                .filter(F.col("score") >= classifier_min_score)
                .select(F.col("doc_id").alias(id_col))
            )
            return inp.join(keep, id_col, "left_semi")
        if stage == "pii":
            return inp.withColumn(text_col, redact_pii(F.col(text_col)))
        if stage == "decontaminate":
            flagged = contaminated_docs(
                inp,
                spark.read.parquet(benchmark_path),
                n=decontam_n,
                min_hits=decontam_min_hits,
                id_col=id_col,
                text_col=text_col,
            ).select(id_col)
            return inp.join(flagged, id_col, "left_anti")
        if stage == "repetition_gate":
            # docs with no non-blank segment emit no stats row and pass
            # the gate by the anti-join semantics
            violators = (
                repetition_stats(inp, id_col, text_col)
                .filter(F.col("dup_line_ratio") > max_dup_line_ratio)
                .select(id_col)
            )
            return inp.join(violators, id_col, "left_anti")
        if stage == "neardup":
            near = minhash_lsh_pairs(
                inp, text_col, id_col,
                n=n, n_hashes=n_hashes, bands=bands, threshold=threshold,
            )
            if survivorship == "cc":
                # iterative connected components: runs its propagation
                # rounds EAGERLY (bounded jobs) at plan-build time
                dropped = neardup_survivors_cc(near).select(
                    F.col("doc_id").alias(id_col)
                )
            else:
                dropped = near.select(F.col("doc_b").alias(id_col)).distinct()
            return inp.join(dropped, id_col, "left_anti")
        if stage == "sample":
            # deterministic membership (pure function of (seed, key)) is
            # what makes this stage safe under the write-ahead resume:
            # a re-run keeps exactly the same rows
            if mixture_weights is not None:
                if source_col not in inp.columns:
                    raise ValueError(
                        f"mixture sampling needs column {source_col!r}, "
                        f"which an earlier stage's projection dropped "
                        f"(have {inp.columns}); use a menu whose stages "
                        "carry it, or uniform sample_rate"
                    )
                return mixture_sample(
                    inp, mixture_weights, source_col=source_col,
                    key_col=id_col, seed=seed, default_rate=default_rate,
                )
            return hash_sample(inp, sample_rate, key_col=id_col, seed=seed)
        if stage == "epoch":
            if source_col not in inp.columns:
                raise ValueError(
                    f"epoch upsampling needs column {source_col!r}, "
                    f"which an earlier stage's projection dropped "
                    f"(have {inp.columns})"
                )
            up = epoch_mixture(
                inp, epoch_weights, source_col=source_col,
                key_col=id_col, seed=seed, default_epochs=default_epochs,
            )
            # every copy gets a distinct deterministic identity so the
            # downstream chunk_id concat and pack's hash ordering treat
            # copies as independent rows (they interleave across bins
            # instead of packing back-to-back)
            return up.withColumn(
                id_col,
                F.concat_ws(
                    "@", F.col(id_col).cast("string"),
                    F.col("epoch").cast("string"),
                ),
            )
        if stage == "chunk":
            return chunk_documents(
                inp, chunk_tokens, overlap, id_col, text_col
            ).withColumn(
                "chunk_id",
                F.concat_ws(
                    "#", F.col(id_col).cast("string"), F.col("chunk_idx")
                ),
            )
        if stage == "pack":
            if "chunk_text" in inp.columns:
                return pack_sequences(
                    inp, bin_tokens, n_shards,
                    id_col="chunk_id", text_col="chunk_text", seed=seed,
                )
            return pack_sequences(
                inp, bin_tokens, n_shards, id_col=id_col, text_col=text_col,
                seed=seed,
            )
        if stage == "shuffle":
            # key on the finest surviving row identity: chunk_id when the
            # chunk stage ran, else the (possibly epoch-rewritten) doc id
            key = "chunk_id" if "chunk_id" in inp.columns else id_col
            return block_shuffle(
                inp, n_blocks=shuffle_blocks, key_col=key, seed=seed
            )
        raise AssertionError(stage)

    cur_path: str | None = None
    for stage in selected:
        path = f"{out_base}/{_STAGE_DIRS[stage]}"
        if f"stage={stage}" in done:
            cur_path = path
            continue
        if not processed and need_pin:
            # first uncommitted stage of this call: pin the configuration
            # before any stage data commits (markers carry no metrics).
            # Both markers always commit TOGETHER so they share one
            # committed_at — the timestamp that scopes which stage rows a
            # later resume trusts.
            commit_units(
                spark, checkpoint_path, run_id,
                {ops_marker: {}, params_marker: {}},
            )
            need_pin = False
        inp = spark.read.parquet(cur_path) if cur_path else docs
        inp, obs_in = count_obs(inp, f"corpus_{stage}_in")
        out, obs_out = count_obs(transform(stage, inp), f"corpus_{stage}_out")
        _run_stage(
            spark, stage, out, obs_in, obs_out, path, checkpoint_path, run_id
        )
        processed.append(f"stage={stage}")
        cur_path = path

    return processed
