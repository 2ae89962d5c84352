"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk``      — exact brute force: broadcast the (small) query set,
                         JVM-side dot products via zip_with/aggregate, top-k
                         per query with a rank window.  The correctness
                         baseline and the right plan when |queries| is small.
* ``lsh_cosine_topk``  — scale path #1: random-hyperplane LSH.  Sign-bit
                         signatures bucket the corpus, the exact rerank runs
                         only inside matching buckets (multi-probe over
                         bands).  Recall < 1 by design — measured against
                         the brute-force baseline in tests.
* ``ivf_topk``         — scale path #2: IVF (inverted-file) coarse
                         quantization.  Each corpus vector lands in the cell
                         of its nearest centroid; a query probes its
                         ``nprobe`` nearest cells and reranks exactly inside
                         them.  The candidate join is a plain shuffle join
                         on a compact int cell id — the classic
                         billion-vector layout (one cell = one partition /
                         file cluster at 100 TB scale).
* ``quantize_int8`` /  — footprint path: symmetric per-vector int8
  ``quantized_cosine_topk``  quantization (3.5× smaller parquet, measured);
                         cosine is scale-invariant so the scale cancels,
                         and the integer dot products make the scores
                         exactly reproducible across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


# Width for the codegen'd unrolled dot/norm fast path (round-7): the
# higher-order ``aggregate(zip_with(...))`` fold is CodegenFallback —
# interpreted per element, one GenericArrayData per pair — which made the
# per-pair score the dominant cost of every brute-force/rerank path
# (measured: 2.3M semdedup pairs spent ~2.9 s in cosine alone).  For rows
# of exactly this width the score is computed as an unrolled
# ``lit(0.0) + a[1]*b[1] + ... + a[d]*b[d]`` chain — the IDENTICAL
# left-associated float operation sequence the fold performs (same
# Catalyst type coercions, same 0.0 seed), so results are bit-equal (the
# oracle gate pins this); any other width falls back to the generic fold.
_UNROLL_DIM = 64


def _dot_fast(a, b):
    s = F.lit(0.0)
    for i in range(1, _UNROLL_DIM + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return F.when(
        (F.size(a) == _UNROLL_DIM) & (F.size(b) == _UNROLL_DIM), s
    ).otherwise(_dot(a, b))


def _norm_fast(a):
    s = F.lit(0.0)
    for i in range(1, _UNROLL_DIM + 1):
        e = F.element_at(a, i)
        s = s + e * e
    return F.when(F.size(a) == _UNROLL_DIM, F.sqrt(s)).otherwise(_norm(a))


def _idot_fast(a, b):
    s = F.lit(0).cast("long")
    for i in range(1, _UNROLL_DIM + 1):
        s = s + F.element_at(a, i).cast("long") * F.element_at(b, i).cast("long")
    return F.when(
        (F.size(a) == _UNROLL_DIM) & (F.size(b) == _UNROLL_DIM), s
    ).otherwise(_idot(a, b))


def _pushdown_fence(col):
    """Round-7 §4.4 guard: wrap a Python-UDF-derived column in an
    always-true non-deterministic branch so PushDownPredicates cannot
    substitute filters below the projection.  Without it, a join/filter
    on the column (even the join's implicit ``isnotnull``) re-inlines the
    UDF below the pushed predicate and the batch evaluates TWICE — the
    guide's duplicated-BatchEvalPython failure, observed as 4
    ArrowEvalPython nodes in semdedup's plan.  Same trick as the expr
    parser fence in plans/pipeline.py; costs one long compare per row."""
    return F.when(F.monotonically_increasing_id() >= 0, col)


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca, cb = F.col(a), F.col(b)
    return df.withColumn(
        out,
        (_dot(ca, cb) / (_norm(ca) * _norm(cb))).cast("double"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (it must be small — the typical "probe set"
    shape); the corpus side streams through one codegen'd stage, then a
    per-query rank window keeps k rows.
    """
    # norms are per-ROW projections (identical doubles), not per-pair
    # folds: with |queries| probes every corpus row previously re-folded
    # its norm once per probe inside the scored projection
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm_fast(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm_fast(F.col(vec_col)).alias("_cn"),
    )
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.withColumn(
        "cosine",
        (
            _dot_fast(F.col("qvec"), F.col("cvec"))
            / (F.col("_qn") * F.col("_cn"))
        ).cast("double"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(float)


def lsh_signature(vec_col, n_planes: int, seed: int = 42, dim: int | None = None):
    """Sign-bit signature of a vector against fixed hyperplanes -> long.

    The hyperplanes are derived LAZILY inside the Arrow pandas UDF from
    ``(n_planes, seed, len(vector))`` — deterministic, so every worker
    materializes the identical matrix with NO driver-side job to sniff the
    embedding width (the round-2 ``.first()`` finding) and no plan
    literals (768 x 16 would be ~12k literals; Catalyst analysis/codegen
    blows up).  Each batch is one ``(batch, dim) @ (dim, n_planes)`` BLAS
    matmul.  NULL vectors yield NULL signatures (round-2 ADVICE: the
    previous form crashed ``np.stack`` on a None in the batch).

    With an explicit ``dim`` any other observed width raises.  When
    ``dim`` is omitted the planes are a deterministic pure function of
    ``(width, n_planes, seed)`` and the per-worker cache is keyed by
    WIDTH, so every worker — whatever subset of partitions it sees —
    derives the identical matrix for a given width.  Vectors of different
    widths therefore hash in separate, internally-consistent spaces; a
    worker-local first-width lock (the previous form) could silently lock
    DIFFERENT widths on different workers when widths are segregated by
    partition (round-4 ADVICE).  Cross-width signatures still must not be
    COMPARED, so every LSH consumer in this module carries the vector
    width in its band join key (``vdim``) — cross-width rows can never
    share a bucket by construction.
    """

    cache: dict[int, np.ndarray] = {}  # per-worker: width -> plane matrix

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        out = pd.Series([pd.NA] * len(vecs), dtype="Int64", index=vecs.index)
        mask = np.array(
            [isinstance(v, (list, np.ndarray)) and len(v) > 0 for v in vecs],
            dtype=bool,
        )
        if not mask.any():
            return out
        by_width: dict[int, list] = {}
        for i in vecs.index[mask]:
            a = np.asarray(vecs[i], dtype=np.float64)
            by_width.setdefault(a.shape[0], []).append((i, a))
        if dim is not None and set(by_width) != {dim}:
            raise ValueError(
                f"lsh_signature: embedding widths {sorted(by_width)} do not "
                f"match the declared dim={dim}; fix the column or drop dim"
            )
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for d, items in by_width.items():
            if d not in cache:
                cache[d] = _hyperplanes(d, n_planes, seed)
            mat = np.stack([a for _, a in items])
            bits = (mat @ cache[d].T) >= 0.0
            out[[i for i, _ in items]] = (bits * weights).sum(axis=1)
        return out

    return _sig(vec_col)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing + exact rerank in-bucket.

    The signature splits into ``bands`` bands; query and corpus rows match
    if ANY band agrees (multi-probe), then exact cosine reranks.  At scale
    the corpus side is grouped by (band, chunk) — a plain shuffle join on a
    compact key instead of a cross join.

    ``dim`` is optional: when omitted the hyperplanes are derived from the
    observed vector width inside the signature UDF (no driver-side job —
    the round-2 ``.first()`` sniff is gone), deterministically per width,
    and the band join key carries the width so mixed-width columns can
    never produce cross-width candidates.  Pass ``dim`` explicitly to
    assert a single width (mismatch raises).
    """
    rows_per_band = n_planes // bands

    def banded(df, idname):
        sig = lsh_signature(F.col(vec_col), n_planes, seed, dim)
        out = df.select(
            F.col(id_col).alias(idname), F.col(vec_col).alias(f"{idname}_vec"),
            sig.alias("sig"),
            # vector width rides the join key: signatures derived for
            # different widths live in separate hash spaces and must never
            # share a bucket (see lsh_signature)
            F.size(F.col(vec_col)).alias("vdim"),
        )
        return out.select(
            idname, f"{idname}_vec", "vdim",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned("sig", b * rows_per_band)
                            .bitwiseAND(F.lit(2**rows_per_band - 1))
                            .alias("chunk"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(idname, f"{idname}_vec", "vdim", "bb.band", "bb.chunk")

    qb = F.broadcast(banded(queries, "query_id"))
    cb = banded(corpus, "neighbor_id")
    cands = (
        qb.join(cb, ["band", "chunk", "vdim"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine",
        (
            _dot_fast(F.col("query_id_vec"), F.col("neighbor_id_vec"))
            / (_norm_fast(F.col("query_id_vec")) * _norm_fast(F.col("neighbor_id_vec")))
        ).cast("double"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same LSH blocking.

    ``dim`` optional as in ``lsh_cosine_topk`` — omitted means the
    signature UDF derives the hyperplanes from the observed vector width
    (no driver job), and the self-join key carries the width so pairs
    never cross widths."""
    rows_per_band = n_planes // bands
    sig = lsh_signature(F.col(vec_col), n_planes, seed, dim)
    banded = df.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec"), sig.alias("sig"),
        F.size(F.col(vec_col)).alias("vdim"),
    ).select(
        "doc_id", "vec", "vdim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sig", b * rows_per_band)
                        .bitwiseAND(F.lit(2**rows_per_band - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "vec", "vdim", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.vdim") == F.col("b.vdim"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    scored = cands.withColumn(
        "cosine",
        (
            _dot_fast(F.col("va"), F.col("vb"))
            / (_norm_fast(F.col("va")) * _norm_fast(F.col("vb")))
        ).cast("double"),
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "doc_a", "doc_b", "cosine"
    )


def ivf_cells(vec_col, centroids: np.ndarray, nprobe: int = 1):
    """Top-``nprobe`` nearest-centroid cell ids for each vector.

    One BLAS matmul per Arrow batch (the centroid matrix ships in the UDF
    closure — same no-plan-literals discipline as ``lsh_signature``).
    Deterministic tie rule shared with the DuckDB oracle: cells ordered by
    (cosine rounded to 6 dp DESC, cell id ASC) — a 1e-15 cross-engine ulp
    cannot flip a 1e-6 boundary, and stable argsort keeps cell-id order
    among exact ties.  NULL/empty/zero-norm vectors yield NULL (a zero
    vector has no defined cosine direction — assigning it the NaN-argsort
    cell would silently diverge from the SQL oracle, round-3 ADVICE).
    """
    cent = np.asarray(centroids, dtype=np.float64)
    cent_norm = np.linalg.norm(cent, axis=1)
    if cent.size and not (cent_norm > 0).all():
        # r6 ADVICE: a zero-norm centroid row (impossible via
        # ivf_seed_centroids, possible for a caller-supplied matrix)
        # yields an all-NaN similarity column; np.argmax would then pick
        # the first NaN index (the zero centroid wins every row) while
        # the argsort path sorts NaNs last — fail loudly instead of
        # diverging between the nprobe=1 fast path and the general path
        raise ValueError(
            "ivf_cells: centroid matrix contains a zero-norm row — a "
            "zero vector has no cosine direction and cannot quantize"
        )

    @F.pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        mask = np.array(
            [
                isinstance(v, (list, np.ndarray))
                and len(v) > 0
                and float(np.linalg.norm(np.asarray(v, dtype=np.float64))) > 0.0
                for v in vecs
            ],
            dtype=bool,
        )
        vals: list = [None] * len(vecs)
        if mask.any():
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
            sims = np.round(
                (mat @ cent.T)
                / (np.linalg.norm(mat, axis=1)[:, None] * cent_norm[None, :]),
                6,
            )
            if nprobe == 1:
                # argmax returns the FIRST index among exact ties — the
                # same (rounded-cosine DESC, cell id ASC) rule as the
                # argsort below, without the O(c log c)-per-row full sort
                # (measured: the sort dominated assignment at 4k cells)
                picked = np.argmax(sims, axis=1).astype("int32")[:, None]
            else:
                order = np.argsort(-sims, axis=1, kind="stable")
                picked = order[:, :nprobe].astype("int32")
            j = 0
            for i in np.flatnonzero(mask):
                vals[i] = picked[j].tolist()
                j += 1
        return pd.Series(vals, dtype="object", index=vecs.index)

    return _cells(vec_col)


def ivf_seed_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse-quantizer seeds: the ``n_centroids`` corpus
    vectors with the smallest ids.  An index-BUILD step (one bounded driver
    action over n_centroids rows, not a per-query plan job); the same rule
    is reproducible in plain SQL, which is what makes the whole IVF path
    oracle-checkable.  Production deployments would refine these with a few
    Lloyd iterations over a sample — the query path below is unchanged by
    where the matrix comes from.  NULL/empty embeddings are skipped (a
    ``list(None)`` seed crashed here, round-3 ADVICE); zero-norm rows are
    skipped too — a centroid with no direction can never win a cosine
    assignment and would divide by zero in ``ivf_cells``."""
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .filter(
            F.aggregate(
                vec_col, F.lit(0.0), lambda acc, x: acc + x * x
            ) > 0.0
        )
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    if not rows:
        raise ValueError(
            "ivf_seed_centroids: no non-null, non-zero embeddings to seed from"
        )
    return np.asarray([list(r[1]) for r in rows], dtype=np.float64)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF coarse quantization + exact in-cell rerank.

    Corpus rows live in exactly ONE cell (their nearest centroid); each
    query probes its ``nprobe`` nearest cells.  The candidate set is a
    shuffle join on the int cell id — at scale the corpus side is written
    partitioned by cell, so a probe touches ``nprobe`` partitions and the
    scan prunes everything else (the inverted-file property).  Recall < 1
    by design; measured against ``cosine_topk`` in tests and against the
    full DuckDB twin in the driver's oracle gate.
    """
    if centroids is None:
        centroids = ivf_seed_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        ivf_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(ivf_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
        )
    )
    # no dedup needed (contrast lsh_cosine_topk): a corpus row lives in
    # exactly ONE cell and a query's probed cells are distinct, so a
    # (query, neighbor) pair cannot occur twice — a dropDuplicates here
    # would be a full extra shuffle over the candidate set for nothing
    return _ivf_probe_rerank(c, q, k)


def _ivf_probe_rerank(cells: DataFrame, probes, k: int) -> DataFrame:
    """Shared candidate-join + exact-rerank tail of the IVF query path:
    ``cells`` has (neighbor_id, nvec, cell), ``probes`` (query_id, qvec,
    cell, broadcast-hinted)."""
    cands = probes.join(cells, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.withColumn(
        "cosine",
        (
            _dot_fast(F.col("qvec"), F.col("nvec"))
            / (_norm_fast(F.col("qvec")) * _norm_fast(F.col("nvec")))
        ).cast("double"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the INVERTED FILE: the corpus written partitioned by
    cell id — the physical layout that makes ``ivf_topk``'s "a probe
    touches nprobe partitions" claim literal.  One pass: assign each row
    its cell, ``partitionBy("cell")`` parquet write.  Returns the centroid
    matrix to query with (persist it beside the index in production).
    Rows with NULL cells (null/empty/zero-norm embeddings) are excluded —
    they can never be retrieved by a cosine probe anyway."""
    if centroids is None:
        centroids = ivf_seed_centroids(corpus, n_centroids, id_col, vec_col)
    (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            ivf_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        )
        .filter(F.col("cell").isNotNull())
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return centroids


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_topk`` against a materialized ``ivf_write_index`` layout.

    The probe side is broadcast and joins on the PARTITION column, so
    Spark's dynamic partition pruning turns the corpus scan into "read the
    probed cells' directories only" — ``PartitionFilters:
    [dynamicpruning#...]`` in the plan (pinned in tests/test_plans.py).
    At 10^12 rows this is the difference between scanning the corpus and
    scanning ``nprobe/n_centroids`` of it per query batch."""
    cells = spark.read.parquet(index_path).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        "cell",
    )
    probes = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(ivf_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
        )
    )
    return _ivf_probe_rerank(cells, probes, k)


def _idot(a, b):
    """Exact integer dot product of two int arrays (terms widened to
    BIGINT before summing — int8·int8·dim(4096) peaks at ~6.6e7, far
    inside int64).  Integer addition is associative, so the result is
    identical under any partitioning, add order, or engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q_i = round(x_i /
    (max|x| / 127))`` stored as ``array<tinyint>`` plus the scale.

    100 TB posture: embeddings dominate the storage and shuffle volume of
    an ANN corpus — ``array<float>`` at dim 768 is ~3 KB/row; int8 is 3.5-4×
    smaller on the wire and in parquet (measured 3.5× on the bench corpus), which is the difference between a
    rerank join that spills and one that doesn't.  Cosine similarity is
    scale-invariant, so the per-vector scale CANCELS in quantized cosine —
    direction survives quantization up to the ~1/127 rounding grain (the
    error bound ``test_quantized_cosine_error`` pins).  The scale column
    is kept for magnitude-aware consumers (dequantize ≈ ``q * scale``).

    All-zero vectors quantize to all-zero (scale 0 kept, no 0/0 NaN);
    NULL vectors stay NULL.  Pure JVM expressions — no Python, stays in
    whole-stage codegen.
    """
    from ..functions.text import bind_once

    v = F.col(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = amax / F.lit(127.0)
    # amax is BOUND once (bind_once) before the per-element lambda:
    # referencing the aggregate expression inside transform would
    # re-reduce the whole vector per element, O(dim^2) per row
    q = bind_once(
        amax,
        lambda m: F.when(
            m > 0,
            F.transform(
                v,
                lambda x: F.round(x.cast("double") / (m / F.lit(127.0))).cast(
                    "tinyint"
                ),
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint"))),
    )
    return df.withColumn(scale_col, scale).withColumn(q_col, q)


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pre_quantized: bool = False,
) -> DataFrame:
    """``cosine_topk`` over int8-quantized vectors: the bandwidth-lean
    brute-force path.  Same contract/columns as ``cosine_topk`` with the
    score in ``qcosine``.

    The dot products are EXACT integers (``_idot``), so the score is a
    deterministic rational ``idot / (sqrt(na) * sqrt(nb))`` — two runs
    (or Spark vs the DuckDB oracle twin) compute bit-identical doubles.
    Ranking ties break on neighbor_id, mirroring ``cosine_topk``.

    ``pre_quantized=True`` is the production shape: both frames already
    carry ``q_embedding`` from a one-time ``quantize_int8`` at ingest
    (materialized int8 parquet is 3.5× smaller — fewer bytes stored,
    scanned and shuffled; local warm-cache compute ties, per bench.py); False quantizes on the fly for ad-hoc use.
    """
    qz_q = queries if pre_quantized else quantize_int8(queries, vec_col=vec_col)
    qz_c = corpus if pre_quantized else quantize_int8(corpus, vec_col=vec_col)
    # per-row self-dot norms (exact integers — identical under any
    # evaluation point), not per-pair: see cosine_topk
    q = F.broadcast(
        qz_q.select(
            F.col(id_col).alias("query_id"),
            F.col("q_embedding").alias("qq"),
            F.sqrt(_idot_fast(F.col("q_embedding"), F.col("q_embedding"))).alias("_qn"),
        )
    )
    c = qz_c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q_embedding").alias("cq"),
        F.sqrt(_idot_fast(F.col("q_embedding"), F.col("q_embedding"))).alias("_cn"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "qcosine",
            (
                _idot_fast(F.col("qq"), F.col("cq"))
                / (F.col("_qn") * F.col("_cn"))
            ).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rnk")
    )


#: target mean cell size for semdedup's auto-derived centroid count:
#: within-cell work scales with sum(cell_size^2), so n_centroids must
#: grow with the corpus to hold E[cell] roughly constant (SemDeDup runs
#: ~50k clusters over LAION-440M, i.e. ~9k/cell; 1024 keeps the in-cell
#: all-pairs below ~0.5M score evaluations per cell for safety margin)
SEMDEDUP_TARGET_CELL = 1024


def semdedup_auto_n_centroids(n_rows: int) -> int:
    """Corpus-size-derived centroid count (see ``SEMDEDUP_TARGET_CELL``)."""
    import math

    return max(16, math.ceil(max(n_rows, 1) / SEMDEDUP_TARGET_CELL))


def semdedup(
    corpus: DataFrame,
    n_centroids: int | None = None,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embedding space coarsely, then drop
    all-but-one of every within-cluster near-duplicate group.

    Returns one row per REMOVED vector: ``(dropped_id, kept_id, cell,
    cosine)`` where ``kept_id`` is the smallest-id same-cell neighbor
    whose rounded cosine clears ``threshold`` (keep-min survivorship,
    the same rule as ``dedup.dedup_survivors``) and ``cosine`` is that
    pair's similarity.  Anti-join the corpus on ``dropped_id`` to
    materialize survivors.

    100 TB shape (the paper runs ~50k clusters over LAION-440M):

    * cell assignment is one Arrow-batched BLAS matmul per batch
      (``ivf_cells``, nprobe=1) — map-side, no shuffle;
    * the candidate join is an equi-join on ``cell``; within-cell
      all-pairs is the ALGORITHM (SemDeDup §2: pairwise cosine inside
      each k-means cluster), not an accident — its cost is bounded by
      cluster granularity, so ``n_centroids`` must scale with the corpus
      to hold E[cell size] roughly constant.  ``n_centroids=None`` (the
      default) DERIVES it as ``max(16, ceil(n_rows /
      SEMDEDUP_TARGET_CELL))`` with one bounded count() action — the
      guard the r6 verdict asked for: a caller can no longer feed a
      10^9-row corpus through 16 cells by omission (explicit
      ``n_centroids``/``centroids`` still win, for the oracle twin and
      granularity studies).  Each side shuffles once on ``cell``; no
      broadcast (both sides are corpus-sized);
    * survivorship is one hash aggregation (``min`` / ``min_by`` per
      dropped id) — map-side combinable.

    Embeddings are cast to double before scoring so the cosine matches a
    float64 oracle bit-for-bit at ``round_digits``.  The reference engine
    has no embedding tier (its dedup surface is exact text identity);
    this extends the dedup family to the semantic level a training-data
    pipeline needs.
    """
    as_double = corpus.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    if centroids is None:
        if n_centroids is None:
            n_centroids = semdedup_auto_n_centroids(as_double.count())
        centroids = ivf_seed_centroids(as_double, n_centroids, "_id", "_v")
    # round-7 physical shape, same rows: (1) the cell column is pushdown-
    # fenced so the self-join's isnotnull null-rejection cannot re-inline
    # the assignment UDF below it (it previously evaluated FOUR times —
    # twice per branch); (2) ONE repartition by cell feeds both join
    # sides, so the assignment + exchange subtree is shared (AQE reuses
    # the materialized stage) and the join needs no further exchange;
    # (3) the vector norm is computed once per VECTOR here, not twice
    # per candidate PAIR — same expression, same double, O(corpus)
    # instead of O(pairs) sqrt-folds.
    cells = as_double.select(
        "_id",
        "_v",
        _pushdown_fence(ivf_cells(F.col("_v"), centroids, 1)[0]).alias("cell"),
        _norm_fast(F.col("_v")).alias("_nrm"),
    ).repartition("cell")
    a = cells.select(
        F.col("_id").alias("kept_cand"),
        F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"),
        "cell",
    )
    b = cells.select(
        F.col("_id").alias("dropped_id"),
        F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("kept_cand") < F.col("dropped_id"))
        .withColumn(
            "cosine",
            F.round(
                (
                    _dot_fast(F.col("_va"), F.col("_vb"))
                    / (F.col("_na") * F.col("_nb"))
                ).cast("double"),
                round_digits,
            ),
        )
    )
    return (
        pairs.filter(F.col("cosine") >= threshold)
        .groupBy("dropped_id", "cell")
        .agg(
            F.min("kept_cand").alias("kept_id"),
            F.min_by("cosine", "kept_cand").alias("cosine"),
        )
        .select("dropped_id", "kept_id", "cell", "cosine")
    )
