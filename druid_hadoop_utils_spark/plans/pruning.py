"""Segment-level pruning by manifest column statistics.

Druid keeps per-segment dimension indexes; the Spark-era analogue here is
per-segment min/max column stats recorded in the manifest at publish time
(``write_segment(stats_columns=...)`` / ``publish_segments``). At plan
time the DimFilter tree is reduced to conservative per-column constraints
and any visible segment whose stats PROVABLY exclude the filter is
dropped from the scan — before Spark ever lists its files. Parquet
row-group stats still prune within the files that remain.

Conservatism rules (anything not provably excludable scans normally):
- only a top-level AND (or a single leaf) of selector / in / bound
  contributes constraints — or/not/regex/search/extraction branches are
  opaque;
- bound filters prune only when the filter's ordering matches the stats
  type (lexicographic over string stats, numeric over numeric stats);
- a NULL selector value never prunes (stats don't track null presence);
- value/stats type mismatches that don't coerce cleanly never prune.
"""

from __future__ import annotations

from collections import defaultdict


def filter_constraints(f: dict | None) -> dict[str, list[tuple]]:
    """DimFilter JSON → {column: [constraint, ...]} for pruning.

    Constraints: ``("in", values)`` or
    ``("range", lower, lower_strict, upper, upper_strict, ordering)``.
    Only conjunctive, extraction-free leaves contribute."""
    out: dict[str, list[tuple]] = defaultdict(list)
    if not f:
        return out

    def walk(node: dict) -> None:
        t = node.get("type")
        if t == "and":
            for child in node.get("fields") or []:
                walk(child)
        elif t == "selector" and not node.get("extractionFn"):
            out[node["dimension"]].append(("in", [node.get("value")]))
        elif t == "in" and not node.get("extractionFn"):
            out[node["dimension"]].append(("in", list(node.get("values") or [])))
        elif t == "bound" and not node.get("extractionFn"):
            ordering = node.get("ordering") or (
                "alphanumeric" if node.get("alphaNumeric") else "lexicographic"
            )
            out[node["dimension"]].append((
                "range",
                node.get("lower"), bool(node.get("lowerStrict", False)),
                node.get("upper"), bool(node.get("upperStrict", False)),
                ordering,
            ))
        # every other node type is opaque: contributes nothing

    walk(f)
    return dict(out)


# beyond 2^53 a double can't represent every int64, and Spark's row-level
# comparisons promote to double — pruning must stay within the range where
# exact and double semantics agree
_EXACT_DOUBLE = 2**53


def _coerce(value, like) -> object | None:
    """Coerce a filter literal to the stats value's type; None = can't
    (and 'can't' always means 'don't prune').

    - numeric stats: parse as float, but refuse magnitudes ≥ 2^53 where
      double arithmetic (what the row filter uses) diverges from exact
      integer comparison;
    - string stats: only a STRING literal compares lexicographically the
      way the row filter does — a numeric literal makes Spark cast the
      column to double instead, which pruning can't model."""
    if value is None:
        return None
    if isinstance(like, bool):
        return None
    if isinstance(like, (int, float)):
        try:
            f = float(value)
        except (TypeError, ValueError):
            return None
        return f if abs(f) < _EXACT_DOUBLE else None
    if isinstance(like, str):
        return value if isinstance(value, str) else None
    return None


def segment_excluded(stats: dict | None, constraints: dict[str, list[tuple]]) -> bool:
    """True iff the segment's stats PROVE no row can satisfy the
    (conjunctive) constraints. Any doubt → False (scan it)."""
    if not stats or not constraints:
        return False
    for col, cons in constraints.items():
        st = stats.get(col)
        if not isinstance(st, dict) or "min" not in st or "max" not in st:
            continue
        lo, hi = st["min"], st["max"]
        if lo is None or hi is None:
            continue
        if isinstance(lo, (int, float)) and not isinstance(lo, bool) and (
            abs(lo) >= _EXACT_DOUBLE or abs(hi) >= _EXACT_DOUBLE
        ):
            continue  # stats outside the double-exact range: don't reason
        for c in cons:
            if c[0] == "in":
                # "" matches NULL-or-empty in the Druid filter semantics
                # (functions/filters._null_or_empty) and min/max stats
                # ignore NULLs — an empty-string value can never prove
                # exclusion
                if not c[1] or any(v == "" for v in c[1]):
                    continue
                vals = [_coerce(v, lo) for v in c[1]]
                if any(v is None for v in vals):
                    continue  # null/uncoercible value: can't prove
                if all(v < lo or v > hi for v in vals):
                    return True
            else:
                _, lower, lstrict, upper, ustrict, ordering = c
                if lower == "" or upper == "":
                    continue  # empty-string bound edges: Druid-null-ish
                numeric_stats = isinstance(lo, (int, float)) and not isinstance(lo, bool)
                if numeric_stats and ordering != "numeric":
                    continue
                if not numeric_stats and ordering != "lexicographic":
                    continue
                l = _coerce(lower, lo) if lower is not None else None
                u = _coerce(upper, lo) if upper is not None else None
                if lower is not None and l is None:
                    continue
                if upper is not None and u is None:
                    continue
                if u is not None and (u < lo or (ustrict and u <= lo)):
                    return True
                if l is not None and (l > hi or (lstrict and l >= hi)):
                    return True
    return False
