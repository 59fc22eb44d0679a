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
    return exclusion_reason(stats, constraints) is not None


def exclusion_reason(stats: dict | None,
                     constraints: dict[str, list[tuple]]) -> str | None:
    """The proof that excludes this segment ("bloom on <col>" / "min/max
    on <col>"), or None when it must be scanned — the explainable core of
    ``segment_excluded``."""
    if not stats or not constraints:
        return None
    for col, cons in constraints.items():
        st = stats.get(col)
        if not isinstance(st, dict):
            continue
        # membership proof first: a Bloom 'definitely absent' on every
        # equality value excludes regardless of min/max overlap
        bloom = st.get("bloom")
        if bloom:
            for c in cons:
                if c[0] == "in" and bloom_excludes(bloom, c[1]):
                    return f"bloom on {col}"
        if "min" not in st or "max" not in st:
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
                    return f"min/max on {col}"
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
                    return f"min/max on {col}"
                if l is not None and (l > hi or (lstrict and l >= hi)):
                    return f"min/max on {col}"
    return None


# ------------------------------------------------------------------ bloom
# Per-segment Bloom filters complement min/max stats for EQUALITY pruning
# on high-cardinality dimensions whose per-segment ranges overlap (ids,
# URLs): min/max can rarely exclude, membership can. The hash is the
# engine-portable md5-prefix integer (same family as dedup.md5_60), so
# the positions Spark computes at publish time are reproduced bit-for-bit
# here on the driver at plan time. A Bloom 'no' is definitive — pruning
# on it is sound; a 'yes' (or any doubt) scans.

BLOOM_M = 8192   # bits per filter (1 KiB packed)
BLOOM_K = 3      # hash functions


def bloom_position_expr(col, seed: int, m: int = BLOOM_M):
    """Spark Column: this value's bit position for hash ``seed``."""
    from pyspark.sql import functions as F

    payload = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long"),
        F.lit(m),
    )


def bloom_position(value: str, seed: int, m: int = BLOOM_M) -> int:
    """Driver-side twin of ``bloom_position_expr`` (identical md5 math)."""
    import hashlib

    h = hashlib.md5(f"{seed}:{value}".encode()).hexdigest()
    return int(h[:15], 16) % m


def pack_bloom(positions: set[int], dtype: str,
               m: int = BLOOM_M, k: int = BLOOM_K) -> dict:
    """Bit positions → manifest-JSON bloom entry (base64-packed bits).
    ``dtype`` is the column's type family ("str" or "int") — the query
    side needs it to canonicalize filter literals the same way
    ``CAST(col AS STRING)`` rendered the data at publish time."""
    import base64

    if dtype not in {"str", "int"}:
        raise ValueError(f"bloom dtype must be 'str' or 'int': {dtype!r}")
    bits = bytearray((m + 7) // 8)
    for p in positions:
        bits[p // 8] |= 1 << (p % 8)
    return {"m": m, "k": k, "t": dtype,
            "bits": base64.b64encode(bytes(bits)).decode()}


def _canonical_bloom_value(value, dtype: str) -> str | None:
    """The string the publish-side expression hashed (``CAST(col AS
    STRING)``), or None when the filter literal can't be proven to render
    identically.

    - "str" columns: only string literals, verbatim ("" is Druid
      null-or-empty — opaque);
    - "int" columns: CAST renders "42", so integer-valued literals
      normalize ("042" → "42", 42.0 → "42"); fractional literals are
      opaque (the row filter compares numerically — 42.5 matches no int
      row, but proving that is min/max's job, not the bloom's)."""
    if value is None or isinstance(value, bool):
        return None
    if dtype == "str":
        return value if isinstance(value, str) and value != "" else None
    if dtype == "int":
        if isinstance(value, int):
            return str(value)
        if isinstance(value, float):
            # a FLOAT literal makes the row filter compare under double
            # promotion; beyond 2^53 a double equals more than one int64,
            # so exact-string bloom membership can't model the match
            if value.is_integer() and abs(value) < _EXACT_DOUBLE:
                return str(int(value))
            return None
        if isinstance(value, str):
            try:
                return str(int(value))
            except ValueError:
                return None
    return None


def bloom_excludes(bloom: dict, values: list) -> bool:
    """True iff EVERY value is provably absent from the segment's bloom."""
    import base64

    try:
        m, k = int(bloom["m"]), int(bloom["k"])
        dtype = bloom["t"]
        bits = base64.b64decode(bloom["bits"])
    except (KeyError, TypeError, ValueError):
        return False
    if len(bits) * 8 < m:
        # truncated/corrupt payload: bits[p // 8] would IndexError at plan
        # time and fail the whole query — conservatively scan instead
        return False
    if not values:
        return False
    for v in values:
        canon = _canonical_bloom_value(v, dtype)
        if canon is None:
            return False
        present = all(
            bits[p // 8] >> (p % 8) & 1
            for p in (bloom_position(canon, seed, m) for seed in range(k))
        )
        if present:
            return False
    return True


def explain_pruning(table_root: str, data_source: str, interval,
                    dim_filter: dict | None) -> list[dict]:
    """Ops-facing dry run of the segment pruner: one dict per VISIBLE
    data segment of ``interval`` — identifier, whether the given DimFilter
    prunes it, and the proof ("bloom on <col>" / "min/max on <col>").
    Segments outside the interval never appear (the timeline already
    removed them). Driver-side metadata only; no Spark job."""
    from druid_hadoop_utils_spark.intervals import Interval, parse_intervals
    from druid_hadoop_utils_spark.sources.segments import (
        list_manifests,
        resolve_visible_windows,
    )

    ivs = parse_intervals(interval)
    span = Interval(ivs[0].start, ivs[-1].end)
    constraints = filter_constraints(dim_filter)
    out = []
    for w in resolve_visible_windows(list_manifests(table_root, data_source),
                                     span):
        m = w.manifest
        if m.tombstone:
            continue
        reason = exclusion_reason(m.stats, constraints)
        out.append({
            "identifier": m.identifier,
            "interval": m.interval.iso(),
            "pruned": reason is not None,
            "reason": reason,
            "stats_columns": sorted(m.stats or {}),
        })
    return out
