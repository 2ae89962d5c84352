"""Parse stage: transcripts DataFrame -> flattened typed-event DataFrame.

Two interchangeable implementations (cross-checked in tests):

- ``parser="pandas"`` (default) — Arrow-vectorized pandas UDF, the literal
  "vectorized grok UDF" stage of the north star.  The ArrowEvalPython node
  is also a deliberate OPTIMIZER BARRIER: downstream filters on parsed
  columns cannot be substituted below it.  With the pure-expression parser,
  Catalyst's PushDownPredicates re-inlines the entire ~60-expression parse
  tree into any pushed predicate, producing a single >64 KB expression that
  janino cannot compile — every affected stage then burns ~60 s of failed
  compilation and falls back to interpreted eval (measured: 191 s vs ~2 s
  on the same input).
- ``parser="expr"`` — pure JVM column expressions (whole-stage codegen).
  Fastest when the query keeps the full parsed column set (no pruning/
  pushdown reshaping, e.g. parse-then-project queries); used there and as
  the semantic cross-check of the pandas parser.

Both keep parse failures in-band as ``parse_error_kind``/``parse_error``
columns (the reference's ``Quake3Events::Error`` variant,
model/src/quake3_events.rs:25): a bad row never aborts the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parse_expr import parse_expr_df
from ..functions.parse_pandas import make_parse_pandas_udf
from ..schemas import EVENT_COLUMN_NAMES

# passthrough transcript columns carried beside the parsed struct
PASSTHROUGH = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]


def parse_transcripts(
    df: DataFrame, parser: str = "arrow", fields: list[str] | None = None
) -> DataFrame:
    """Parse the ``text`` column of a transcripts table into typed columns.

    ``fields`` narrows the emitted event columns (event_type always
    included) — with the arrow parser this shrinks the Arrow payload
    crossing the Python boundary, which is the stage's scaling limit on a
    single box.

    ``parser`` is one of:
      * ``arrow``  (default) — pyarrow.compute kernels via mapInArrow; the
        fastest path and an optimizer barrier (see module docstring)
      * ``pandas`` — Arrow-batched pandas UDF (same barrier, ~10x slower
        string kernels; kept as a semantic cross-check)
      * ``expr``   — pure JVM column expressions (whole-stage codegen);
        safe only when the full parsed column set is kept downstream
    """
    # pass through every non-event column (includes match columns when the
    # caller sessionized on raw text first — see sessionize_raw)
    cols = [c for c in df.columns if c not in EVENT_COLUMN_NAMES]
    out_fields = (
        EVENT_COLUMN_NAMES
        if fields is None
        else [c for c in EVENT_COLUMN_NAMES if c == "event_type" or c in fields]
    )
    if parser == "expr":
        return parse_expr_df(df.select(*cols)).select(*cols, *out_fields)
    if parser == "pandas":
        ev = make_parse_pandas_udf()(df["text"])
        return df.select(*cols, ev.alias("_ev")).select(
            *cols, *[f"_ev.{f}" for f in out_fields]
        )
    if parser == "arrow":
        from pyspark.sql import types as T

        from ..functions.parse_arrow import make_map_in_arrow_fn
        from ..schemas import EVENT_FIELDS

        narrowed = df.select(*cols)
        out_schema = T.StructType(
            [narrowed.schema[c] for c in cols]
            + [T.StructField(n, t, True) for n, t in EVENT_FIELDS if n in out_fields]
        )
        return narrowed.mapInArrow(
            make_map_in_arrow_fn(cols, None if fields is None else out_fields),
            schema=out_schema,
        )
    raise ValueError(f"unknown parser {parser!r} (want 'arrow', 'pandas' or 'expr')")

def fail_on_feed_errors(parsed: DataFrame) -> DataFrame:
    """Pedantic feed gate: abort the job on the FIRST in-band parse error.

    The reference's ``--pedantic`` flag sets ``stop_on_feed_errors``
    (app/src/main.rs:84-85), turning every ``LogParsingError`` fatal.  The
    distributed analogue: ``raise_error`` folded into ``turn_idx`` (a
    column every downstream stage consumes, so column pruning can never
    elide the check) — the first malformed line fails the Spark job with
    the reference-shaped message instead of flowing to the dead-letter
    sink.
    """
    err = F.col("parse_error_kind").isNotNull()
    return parsed.withColumn(
        "turn_idx",
        F.when(~err, F.col("turn_idx")).otherwise(
            F.raise_error(
                F.format_string(
                    "Failed to process event #%d: `LogParsingError`: %s",
                    F.col("turn_idx"),
                    F.col("parse_error"),
                )
            ).cast("int")
        ),
    )
