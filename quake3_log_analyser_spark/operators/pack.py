"""Sequence preparation for training: chunking and packing.

The last mile of a training-data pipeline turns cleaned documents into
model-ready sequences: long documents split into fixed-token windows with
overlap (``chunk_documents``), then documents/chunks grouped into
fixed-token-budget bins so a training batch wastes minimal padding
(``pack_sequences``).

Both are pure JVM expression work (token arrays via ``ws_tokens``,
``sequence``/``slice``/``explode`` for chunks, a windowed running sum for
bins) — no Python, no UDFs — and both are deterministic pure functions of
the input rows, so the same corpus packs identically on every run and the
DuckDB oracle twins are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import bind_once, ws_tokens
from .corpus import _hash_hex


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` tokens, stepping ``chunk_tokens - overlap`` tokens —
    the standard long-document treatment before packing/embedding.

    One chunk per start position ``1, 1+step, ...`` while the start still
    ADDS tokens — i.e. up to ``max(k - overlap, 1)`` for a ``k``-token
    document, so a tail chunk lying entirely inside the previous window
    (pure overlap, duplicated tokens as a standalone training sequence)
    is never emitted; the final chunk may be shorter.  Empty/blank
    documents emit no row.  Returns ``(doc_id, chunk_idx, n_tokens,
    chunk_text)`` with ``chunk_idx`` 0-based in document order.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )
    step = chunk_tokens - overlap

    def _chunks(toks):
        # toks is a BOUND lambda variable (bind_once): slicing the raw
        # ws_tokens expression inside the per-chunk lambda would
        # re-tokenize the document per chunk start, O(len^2/step)
        k = F.size(toks)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(k - overlap, F.lit(1)), F.lit(step)),
            lambda s: F.slice(toks, s, chunk_tokens),
        )

    chunks = bind_once(ws_tokens(F.col(text_col)), _chunks)
    return (
        docs.select(F.col(id_col), chunks.alias("_chunks"))
        .filter(F.size("_chunks") > 0)
        .select(
            id_col,
            F.posexplode("_chunks").alias("chunk_idx", "_toks"),
        )
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            "chunk_idx",
            F.size("_toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "_toks").alias("chunk_text"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    bin_tokens: int = 2048,
    n_shards: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    token_counter=None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin.

    ``token_counter`` plugs in the budget's token measure: a callable
    ``Column -> Column`` (e.g. ``lambda c: functions.text.
    vocab_token_count(c, vocab)`` for a real tokenizer vocabulary, or
    ``bpe_ish_token_count``); ``None`` keeps the default whitespace
    count, which is what the DuckDB oracle twin mirrors.

    Scalable deterministic packing: documents are hash-assigned to
    ``n_shards`` independent shards (at 10^12 rows the shard count bounds
    per-window state — set it to O(cluster cores)); within a shard they are
    ordered by a content hash (a reproducible shuffle, not head-of-file
    order) and a running token sum assigns each doc to the bin where it
    STARTS: ``bin_seq = floor(cumsum_before / bin_tokens)``.  Bins
    therefore overflow by at most one document — the streaming-friendly
    approximation every large-scale packer makes (exact bin packing is
    NP-hard and inherently serial).  Returns ``(doc_id, n_tokens, shard,
    bin_seq)``; ``(shard, bin_seq)`` is the global bin key.
    """
    h = _hash_hex(id_col, seed)
    count = (
        token_counter(F.col(text_col))
        if token_counter is not None
        else F.size(ws_tokens(F.col(text_col)))
    )
    base = docs.select(
        F.col(id_col),
        count.cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(cum_before / bin_tokens).cast("long").alias("bin_seq"),
    )
