"""JSON report rendering — parity with the reference's hand-rolled
serializer (presentation/src/lib.rs:16-124).

``to_json`` renders an ordered stream of match-summary rows (the
``MATCH_SUMMARY_SCHEMA`` shape) into the exact ``{"game_N": {...}}`` text
the reference emits: same indentation, same separators, same conditional
optional sections, same game_id numbering (error rows consume a game_id
without emitting output, lib.rs:66-71), and the same ``stop_on_errors``
fail-fast (lib.rs:56-64).

``render_conv_reports`` is the distributed form: ONE grouped-map fold per
conversation runs the exact replay (functions/replay.py) and renders its
rows in stream order, yielding a ``(conv_id, report)`` DataFrame — each
conversation is the analogue of one reference CLI invocation over one log
file.  Rendering happens executor-side; nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Any, Iterable


class ReportError(RuntimeError):
    """Raised in ``stop_on_errors`` (pedantic) mode on the first error row
    in the summary stream (presentation/src/lib.rs:56-64)."""


def _get(row: Any, key: str):
    # accept pyspark Rows, dicts, and plain objects alike
    try:
        return row[key]
    except (TypeError, IndexError, KeyError):
        return getattr(row, key)


def _serialize_set(items: Iterable[str]) -> str:
    # lib.rs:81-95 — one line: ["a", "b"]; empty -> []
    return "[" + ", ".join(f'"{it}"' for it in items) + "]"


def _serialize_map(pre_ident: str, entries: Iterable[tuple[str, Any]]) -> str:
    # lib.rs:97-111 — "{\n  " + pre + '"k": v' entries joined by ",\n  "+pre,
    # closed by "\n" + pre + "}".  Entries arrive already name-sorted
    # (BTreeMap order; the fold renders maps sorted, functions/replay.py).
    acc = "{\n  "
    first = True
    for key, value in entries:
        if not first:
            acc += ",\n  "
        first = False
        acc += f'{pre_ident}"{key}": {value}'
    return acc + "\n" + pre_ident + "}"


def _serialize_vec(pre_ident: str, entries: Iterable[tuple[int, str, int]]) -> str:
    # lib.rs:113-127 — entries are {"id": n, "name": "s", "frags": n} objects
    acc = "[\n  "
    first = True
    for pid, name, frags in entries:
        if not first:
            acc += ",\n  "
        first = False
        acc += f'{pre_ident}{{"id": {pid}, "name": "{name}", "frags": {frags}}}'
    return acc + "\n" + pre_ident + "]"


def to_json(
    summary_rows: Iterable[Any],
    stop_on_errors: bool = False,
) -> str:
    """Render summary/error rows (STREAM ORDER) to the reference's JSON.

    Each row is one stream item: ``error`` is None for a summary, else the
    row is the ``Err`` case — it consumes a game_id and emits nothing
    (unless ``stop_on_errors``, which raises with the reference's message,
    lib.rs:56-64).  Byte-for-byte parity includes the reference's quirk
    that an error as the FIRST stream item still makes the next summary
    emit a leading ``",\\n"`` — parity beats prettiness here.
    """
    out = ["{\n"]
    game_id = 1
    for row in summary_rows:
        error = _get(row, "error")
        if error is not None:
            if stop_on_errors:
                raise ReportError(
                    "presentation: to_json(): Error in `games_summary_stream` "
                    f"while processing game_id {game_id}: {error}"
                )
            game_id += 1
            continue
        if game_id > 1:
            out.append(",\n")
        out.append(f'  "game_{game_id}": {{\n')
        out.append(f'    "total_kills": {_get(row, "total_kills")},\n')
        out.append(f'    "players": {_serialize_set(_get(row, "players") or [])},\n')
        kills = [
            (_get(k, "player"), _get(k, "frags")) for k in (_get(row, "kills") or [])
        ]
        out.append(f'    "kills": {_serialize_map("    ", kills)}')

        means = _get(row, "kills_by_means")
        if means is not None:
            entries = [(_get(m, "mean"), _get(m, "count")) for m in means]
            out.append(",\n")
            out.append(f'    "kills_by_means": {_serialize_map("    ", entries)}')
        scores = _get(row, "game_reported_scores")
        if scores is not None:
            entries = [(_get(s, "player"), _get(s, "frags")) for s in scores]
            out.append(",\n")
            out.append(
                f'    "game_reported_scores": {_serialize_map("    ", entries)}'
            )
        disconnected = _get(row, "disconnected_players")
        if disconnected is not None:
            entries = [
                (_get(d, "id"), _get(d, "name"), _get(d, "frags"))
                for d in disconnected
            ]
            out.append(",\n")
            out.append(
                f'    "disconnected_players": {_serialize_vec("    ", entries)}'
            )
        out.append("\n  }")
        game_id += 1
    out.append("\n}")
    return "".join(out)


def render_conv_reports(
    translated,
    ops: frozenset[str] | set[str] | None = None,
    stop_on_violations: bool = False,
    stop_on_errors: bool = False,
):
    """Distributed per-conversation JSON reports.

    Runs the exact replay fold AND the renderer inside ONE grouped-map per
    ``conv_id`` (the rows never leave the executor), so emission order is
    the true stream order — including error rows' positions, which a
    summary DataFrame alone cannot reconstruct.  Returns a DataFrame
    ``(conv_id string, report string)``.
    """
    import pandas as pd

    from .functions.replay import DEFAULT_OPS, new_state, replay_events
    from .operators.summarize import FOLD_COLUMNS

    ops = frozenset(ops) if ops is not None else DEFAULT_OPS
    # the render fold indexes every fold column — fail at analysis time
    # with a clear message instead of a per-task KeyError at execution
    missing = [c for c in FOLD_COLUMNS if c not in translated.columns]
    if missing:
        raise ValueError(
            f"render_conv_reports needs fold columns {missing}; "
            f"input has {translated.columns} (parse with fields=None or "
            f"fields ⊇ FOLD_COLUMNS)"
        )
    cols = list(FOLD_COLUMNS)

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id = pdf["conv_id"].iloc[0]
        pdf = pdf.sort_values("turn_idx")
        events = zip(
            pdf["turn_idx"].tolist(),
            [None if v is None or (isinstance(v, float) and pd.isna(v)) else v
             for v in pdf["event_type"].tolist()],
            pdf["client_id"].tolist(),
            pdf["name"].tolist(),
            pdf["killer_id"].tolist(),
            pdf["victim_id"].tolist(),
            pdf["killer_name"].tolist(),
            pdf["victim_name"].tolist(),
            pdf["reason_name"].tolist(),
            pdf["frags"].tolist(),
        )
        rows = replay_events(new_state(), conv_id, events, ops, stop_on_violations)
        report = to_json(rows, stop_on_errors=stop_on_errors)
        return pd.DataFrame({"conv_id": [conv_id], "report": [report]})

    return translated.select(*cols).groupBy("conv_id").applyInPandas(
        render, schema="conv_id string, report string"
    )
