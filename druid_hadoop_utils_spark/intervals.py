"""ISO-8601 ``start/end`` interval handling, UTC-pinned.

Druid intervals are half-open ``[start, end)`` ISO-8601 pairs separated by
``/`` (reference: DruidStorage.java:206 ``new Interval(interval)``,
DruidInputFormat.java:87-91 — exactly one query interval). All arithmetic here
is timezone-aware UTC.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone


def parse_ts(value: str | datetime) -> datetime:
    """Parse an ISO-8601 timestamp to an aware-UTC datetime."""
    if isinstance(value, datetime):
        dt = value
    else:
        v = value.strip()
        if v.endswith("Z"):
            v = v[:-1] + "+00:00"
        dt = datetime.fromisoformat(v)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


@dataclass(frozen=True, order=True)
class Interval:
    """Half-open [start, end) UTC interval."""

    start: datetime
    end: datetime

    def __post_init__(self) -> None:
        if self.start >= self.end:
            raise ValueError(f"empty/negative interval: {self.start}/{self.end}")

    @classmethod
    def parse(cls, text: str | "Interval") -> "Interval":
        if isinstance(text, Interval):
            return text
        start, _, end = text.partition("/")
        if not end:
            raise ValueError(f"interval must be 'start/end', got: {text!r}")
        return cls(parse_ts(start), parse_ts(end))

    def overlaps(self, other: "Interval") -> bool:
        return self.start < other.end and other.start < self.end

    def intersect(self, other: "Interval") -> "Interval | None":
        start = max(self.start, other.start)
        end = min(self.end, other.end)
        return Interval(start, end) if start < end else None

    def contains_point(self, ts: datetime) -> bool:
        return self.start <= ts < self.end

    def covers(self, other: "Interval") -> bool:
        return self.start <= other.start and other.end <= self.end

    def iso(self) -> str:
        return f"{self.start.isoformat()}/{self.end.isoformat()}"

    def __str__(self) -> str:  # pragma: no cover
        return self.iso()


def parse_intervals(value) -> list["Interval"]:
    """Normalize an interval argument — a single ``start/end`` string or
    ``Interval``, or a list of them — to a condensed (merged, sorted) list.
    Druid condenses its ``intervals`` array the same way before planning."""
    if value is None:
        return []
    items = value if isinstance(value, (list, tuple)) else [value]
    return merge_adjacent([Interval.parse(v) for v in items])


def merge_adjacent(intervals: list[Interval]) -> list[Interval]:
    """Merge touching/overlapping intervals (input in any order)."""
    if not intervals:
        return []
    out: list[Interval] = []
    for iv in sorted(intervals, key=lambda i: (i.start, i.end)):
        if out and iv.start <= out[-1].end:
            if iv.end > out[-1].end:
                out[-1] = Interval(out[-1].start, iv.end)
        else:
            out.append(iv)
    return out
