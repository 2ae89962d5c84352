"""Character-trigram language-model quality scoring — the CCNet-style
perplexity filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"), re-expressed as two hash
aggregations and one broadcast join.

A tiny smoothed LM is trained over a reference corpus; every candidate
document is scored by its average per-trigram log-probability.  Gibberish,
encoding damage, and boilerplate score far below fluent text, making the
score a cheap, strong pre-training gate (the reference engine has no LM
stage — this belongs to the beyond-the-reference training-data tier,
like `functions/text.py::quality_score`).

100 TB posture:
- **Training** is `explode(trigrams) -> groupBy(tri).count()`: the shuffle
  key space is bounded by the distinct normalized trigrams of the corpus
  (tens of thousands for natural-language text, NOT corpus-sized), so
  partial aggregation collapses the map side and the final model is tiny.
- **Scoring** broadcasts the model and runs `explode -> broadcast join ->
  groupBy(doc_id)`: one shuffle on doc_id with map-side partial sums.
  No all-pairs, no window, no Python anywhere.
- **Exactness**: per-trigram log-probs are rounded to integer MICRO-units
  (`round(ln(p) * 1e6)` as BIGINT) before aggregation, so the per-doc sum
  is an exact integer no matter the partitioning or add order — the usual
  float-sum non-associativity cannot make two runs (or Spark vs the
  DuckDB oracle twin) disagree.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quake3_log_analyser_spark.functions.text import bind_once, normalize_text

#: Laplace-smoothing vocabulary size: the assumed number of possible
#: trigram continuations per 2-char context.  Any fixed constant works —
#: it only shifts the floor; 2**14 keeps unseen-trigram scores clearly
#: below fluent text without drowning the signal.
VOCAB_SIZE = 16384


def char_trigrams(text: Column) -> Column:
    """Array of overlapping character trigrams of the NORMALIZED text
    (lowercased, whitespace collapsed — the same canonical form the
    dedup fingerprint uses).  Texts shorter than 3 normalized chars give
    an empty array.  Pure JVM expressions (sequence + transform + substr).
    """
    def _from_chars(cs):
        # cs is the normalized text split to a BOUND char array
        # (bind_once).  Two O(len^2) traps avoided, both measured on a
        # 200k x 800-char corpus: substr-ing the raw normalize_text
        # EXPRESSION inside the per-position lambda re-runs the regexp
        # normalization per trigram (326 s); even a bound string stays
        # quadratic because UTF8String.substr(i, 3) scans code points
        # from the start, O(i) per call (30 s).  Three element_at hits
        # on the bound char array are O(1) each -> 7 s, truly linear.
        k = F.size(cs)
        return F.when(
            k >= 3,
            F.transform(
                F.sequence(F.lit(1), k - 2),
                lambda i: F.concat(
                    F.element_at(cs, i),
                    F.element_at(cs, i + 1),
                    F.element_at(cs, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(F.split(normalize_text(text), ""), _from_chars)


def _logp_micro(tri_cnt: Column, ctx_cnt: Column, alpha: float) -> Column:
    p = (tri_cnt + F.lit(alpha)) / (ctx_cnt + F.lit(alpha * VOCAB_SIZE))
    return F.round(F.log(p) * 1e6).cast("long")


def unk_logp_micro(alpha: float = 1.0) -> int:
    """Score for a trigram absent from the model: the smoothed
    probability under a never-seen context, ``alpha / (alpha * V)``.

    This is an APPROXIMATION, not a lower bound: a trigram seen once
    under a very common context scores ``ln((1+alpha) / (ctx_cnt +
    alpha*V))``, which falls below ``ln(1/V)`` once ``ctx_cnt`` is large —
    so a document of never-seen trigrams can outscore fluent text built
    from rare-but-seen ones.  CCNet proper scores unseen trigrams under
    their actual context when the context is known; this operator trades
    that refinement for a model keyed on the trigram alone (one broadcast
    join, and an oracle twin that embeds the same constant).  A plain
    Python constant so both the Spark plan and the SQL oracle embed the
    same literal."""
    return int(round(math.log(1.0 / VOCAB_SIZE) * 1e6))


def train_char_lm(
    docs: DataFrame, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """Train the trigram model: ``(tri, logp_micro)``.

    ``logp_micro = round(1e6 * ln((count(tri) + alpha) /
    (count(context) + alpha * VOCAB_SIZE)))`` where the context is the
    trigram's first two characters — add-alpha-smoothed conditional
    probability of the third character.  The result is small enough to
    broadcast (bounded by the corpus's distinct normalized trigrams);
    for a multilingual 100 TB corpus expect low hundreds of thousands of
    rows — still broadcast range.
    """
    tric = (
        docs.select(F.explode(char_trigrams(F.col(text_col))).alias("tri"))
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
    ctxc = tric.groupBy(F.substring("tri", 1, 2).alias("ctx")).agg(
        F.sum("tri_cnt").alias("ctx_cnt")
    )
    model = tric.withColumn("ctx", F.substring("tri", 1, 2)).join(ctxc, "ctx")
    return model.select(
        "tri", _logp_micro(F.col("tri_cnt"), F.col("ctx_cnt"), alpha).alias("logp_micro")
    )


def lm_doc_scores(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Score every document against a trained model:
    ``(doc_id, n_tri, sum_logp_micro, avg_logp)``.

    ``avg_logp`` is the mean per-trigram natural-log probability (rounded
    to 4 dp for presentation); higher (closer to 0) = more fluent under
    the model.  Documents with no trigrams (< 3 normalized chars) keep
    ``n_tri = 0`` and NULL scores rather than vanishing — a gate must see
    them to decide their fate explicitly.  The model side is broadcast;
    the only shuffle is the per-doc aggregation.
    """
    unk = F.lit(unk_logp_micro(alpha))
    tris = docs.select(
        F.col(id_col), F.explode_outer(char_trigrams(F.col(text_col))).alias("tri")
    )
    scored = (
        tris.join(F.broadcast(model), "tri", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("tri").isNotNull(), F.coalesce("logp_micro", unk))
            ).alias("sum_logp_micro"),
            F.count("tri").alias("n_tri"),
        )
    )
    return scored.select(
        id_col,
        F.col("n_tri").cast("long").alias("n_tri"),
        F.col("sum_logp_micro").cast("long").alias("sum_logp_micro"),
        F.when(
            F.col("n_tri") > 0,
            F.round(F.col("sum_logp_micro") / F.col("n_tri") / 1e6, 4),
        ).alias("avg_logp"),
    )


def lm_gate(
    docs: DataFrame,
    model: DataFrame,
    min_avg_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose average trigram log-prob clears the threshold
    (zero-trigram documents are dropped — nothing to attest fluency)."""
    scores = lm_doc_scores(docs, model, id_col=id_col, text_col=text_col)
    keep = scores.filter(F.col("avg_logp") >= min_avg_logp).select(id_col)
    return docs.join(keep, id_col, "semi")
