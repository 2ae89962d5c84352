"""ANN production job — build the IVF inverted file once, query it many
times (``spark-submit --py-files`` launcher).

    zip -r pipeline.zip quake3_log_analyser_spark/
    spark-submit --py-files pipeline.zip jobs/run_ann.py index \
        --corpus <embeddings parquet> --index <index base path> \
        [--n-centroids 64] [--id-col vec_id] [--vec-col embedding]
    spark-submit --py-files pipeline.zip jobs/run_ann.py query \
        --index <index base path> --queries <queries parquet> \
        --output <results parquet> [--k 10] [--nprobe 2]

``index`` assigns every corpus vector its nearest-centroid cell and
writes the corpus ``partitionBy(cell)`` plus the centroid matrix beside
it — the layout whose probe join dynamic-partition-prunes down to
``nprobe`` cell directories per query batch (operators/ann.py).
``query`` loads the persisted centroids, probes, reranks exactly
in-cell, and writes ``(query_id, neighbor_id, cosine, rnk)``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("index")
    ix.add_argument("--corpus", required=True)
    ix.add_argument("--index", required=True)
    ix.add_argument("--n-centroids", type=int, default=64)
    ix.add_argument("--id-col", default="vec_id")
    ix.add_argument("--vec-col", default="embedding")

    qy = sub.add_parser("query")
    qy.add_argument("--index", required=True)
    qy.add_argument("--queries", required=True)
    qy.add_argument("--output", required=True)
    qy.add_argument("--k", type=int, default=10)
    qy.add_argument("--nprobe", type=int, default=2)
    qy.add_argument("--id-col", default="vec_id")
    qy.add_argument("--vec-col", default="embedding")

    args = ap.parse_args(argv)

    import numpy as np
    from pyspark.sql import SparkSession

    from quake3_log_analyser_spark.operators.ann import (
        ivf_topk_indexed,
        ivf_write_index,
    )
    from quake3_log_analyser_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("ann-pipeline")

    if args.cmd == "index":
        corpus = spark.read.parquet(args.corpus)
        cent = ivf_write_index(
            corpus, f"{args.index}/cells", n_centroids=args.n_centroids,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cent)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{args.index}/centroids")
        print(f"ann index: {len(cent)} cells -> {args.index}")
    else:
        cent_rows = sorted(
            spark.read.parquet(f"{args.index}/centroids").collect(),
            key=lambda r: r["cell"],
        )
        cent = np.asarray([r["centroid"] for r in cent_rows], dtype=np.float64)
        queries = spark.read.parquet(args.queries)
        out = ivf_topk_indexed(
            spark, f"{args.index}/cells", queries, cent,
            k=args.k, nprobe=args.nprobe,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation("ann_results")
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        out.write.mode("overwrite").parquet(args.output)
        print(f"ann query: {obs.get['n']} result rows -> {args.output}")


if __name__ == "__main__":
    main()
