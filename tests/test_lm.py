"""Char-trigram LM quality scoring: hand-computed model values, exact
integer micro-unit sums (partition-order independence), fluent-vs-
gibberish separation, empty/short-doc handling, gating."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quake3_log_analyser_spark.operators.lm import (
    VOCAB_SIZE,
    char_trigrams,
    lm_doc_scores,
    lm_gate,
    train_char_lm,
    unk_logp_micro,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_trigrams_normalize_and_short_text(spark):
    got = spark.range(1).select(
        char_trigrams(F.lit("  Hello   World ")).alias("g"),
        char_trigrams(F.lit("ab")).alias("short"),
        char_trigrams(F.lit("   ")).alias("blank"),
    ).head()
    assert got["g"] == [
        "hel", "ell", "llo", "lo ", "o w", " wo", "wor", "orl", "rld",
    ]
    assert got["short"] == []
    assert got["blank"] == []


def test_train_char_lm_hand_computed(spark):
    # "aaaa" -> trigrams {aaa x2}; context "aa" count 2
    m = {r["tri"]: r["logp_micro"]
         for r in train_char_lm(_docs(spark, [(1, "aaaa")])).collect()}
    assert m == {"aaa": int(round(math.log(3 / (2 + VOCAB_SIZE)) * 1e6))}


def test_lm_scores_unseen_trigrams_hit_the_floor(spark):
    model = train_char_lm(_docs(spark, [(1, "aaaa")]))
    got = lm_doc_scores(_docs(spark, [(9, "zzzz")]), model).head()
    unk = unk_logp_micro()
    assert got["n_tri"] == 2
    assert got["sum_logp_micro"] == 2 * unk
    assert got["avg_logp"] == round(unk / 1e6, 4)


def test_lm_scores_empty_and_short_docs_kept_with_null_score(spark):
    model = train_char_lm(_docs(spark, [(1, "the cat sat on the mat")]))
    rows = {r["doc_id"]: r for r in lm_doc_scores(
        _docs(spark, [(1, ""), (2, "ab"), (3, "the cat")]), model).collect()}
    assert set(rows) == {1, 2, 3}
    for short_id in (1, 2):
        assert rows[short_id]["n_tri"] == 0
        assert rows[short_id]["sum_logp_micro"] is None
        assert rows[short_id]["avg_logp"] is None
    assert rows[3]["n_tri"] == len("the cat") - 2
    assert rows[3]["avg_logp"] is not None


def test_lm_separates_fluent_from_gibberish_and_gates(spark):
    fluent = "the cat sat on the mat and the dog sat on the log"
    train = _docs(spark, [(i, fluent) for i in range(3)])
    model = train_char_lm(train)
    cand = _docs(spark, [(1, "the cat sat on the log"), (2, "qzx wvj pqk fzz")])
    scores = {r["doc_id"]: r["avg_logp"]
              for r in lm_doc_scores(cand, model).collect()}
    assert scores[1] > scores[2], scores
    # threshold between the two gates exactly the fluent doc through
    cut = (scores[1] + scores[2]) / 2
    kept = [r["doc_id"] for r in lm_gate(cand, model, cut).collect()]
    assert kept == [1]


def test_lm_scores_exact_under_repartition(spark):
    """Integer micro-unit sums: any partitioning/add order gives the
    IDENTICAL rows, not merely close ones."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(base)
    a = sorted(map(tuple, lm_doc_scores(base, model).collect()))
    b = sorted(map(tuple, lm_doc_scores(
        base.repartition(13), model).collect()))
    assert a == b
    # and the model itself is partition-invariant
    ma = sorted(map(tuple, train_char_lm(base).collect()))
    mb = sorted(map(tuple, train_char_lm(base.repartition(7)).collect()))
    assert ma == mb


def test_lm_gate_stage_in_corpus_job(spark, tmp_path):
    """The production corpus job runs lm_gate as a checkpointed stage:
    gibberish dropped, fluent kept, resume is a no-op, and an external
    reference corpus can supply the model."""
    from quake3_log_analyser_spark.plans.corpus_run import run_corpus_resumable

    fluent = "the cat sat on the mat and the dog sat on the log"
    docs = _docs(
        spark,
        [(i, fluent + f" extra tail {i}") for i in range(6)]
        + [(99, "qzx wvj pqk fzz bnm qqj")],
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    done = run_corpus_resumable(
        spark, docs, out, ckpt, run_id="lm1", ops=("lm_gate",),
        lm_min_avg_logp=-8.0,
    )
    assert done == ["stage=lm_gate"]
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out}/lm_gated").collect()}
    assert 99 not in kept and set(range(6)) <= kept

    # resume: everything committed, nothing re-runs
    assert run_corpus_resumable(
        spark, docs, out, ckpt, run_id="lm2", ops=("lm_gate",),
        lm_min_avg_logp=-8.0,
    ) == []

    # a changed threshold must refuse to resume (params marker)
    import pytest

    with pytest.raises(ValueError, match="params"):
        run_corpus_resumable(
            spark, docs, out, ckpt, run_id="lm3", ops=("lm_gate",),
            lm_min_avg_logp=-5.0,
        )

    # external reference corpus drives the model: train on a fluent-only
    # reference (replicated so fluent trigram counts beat the smoothing
    # floor: cand scores computed by hand = -7.34 fluent / -9.70
    # gibberish), same gate decision
    ref_path = str(tmp_path / "ref")
    _docs(spark, [(i, fluent) for i in range(10)]).write.parquet(ref_path)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    run_corpus_resumable(
        spark, docs, out2, ckpt2, run_id="lm4", ops=("lm_gate",),
        lm_min_avg_logp=-8.0, lm_ref_path=ref_path,
    )
    kept2 = {r["doc_id"] for r in spark.read.parquet(f"{out2}/lm_gated").collect()}
    assert 99 not in kept2 and set(range(6)) <= kept2
