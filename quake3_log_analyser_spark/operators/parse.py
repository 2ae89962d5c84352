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

from ..functions.parse_expr import parse_expr_df
from ..functions.parse_pandas import make_parse_pandas_udf
from ..schemas import EVENT_COLUMN_NAMES

# passthrough transcript columns carried beside the parsed struct
PASSTHROUGH = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]


def parse_transcripts(df: DataFrame, parser: str = "pandas") -> DataFrame:
    """Parse the ``text`` column of a transcripts table into typed columns."""
    cols = [c for c in PASSTHROUGH if c in df.columns]
    if parser == "expr":
        return parse_expr_df(df.select(*cols)).select(*cols, *EVENT_COLUMN_NAMES)
    if parser == "pandas":
        ev = make_parse_pandas_udf()(df["text"])
        return df.select(*cols, ev.alias("_ev")).select(*cols, "_ev.*")
    raise ValueError(f"unknown parser {parser!r} (want 'expr' or 'pandas')")
