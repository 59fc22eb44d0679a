"""LoadSpec — the declared per-query schema/spec of the engine.

Mirrors the two JSON spec shapes the reference accepts (SURVEY.md §1.4):

- the Pig schema-file shape ``{granularity, dimensions, metrics:[{name,type}],
  filter?}`` (reference: PigSegmentLoadSpec.java:28-44, sample-schema.json:1-8)
- the inline MR ingestion shape ``{dataSource, interval(s), granularity,
  dimensions, metrics, filter?}`` (reference: DruidInputFormat.java:76-86,
  DruidInputFormatTest.java:74-82)

Granularity defaults to NONE when absent (reference:
PigSegmentLoadSpec.java:42). Metric typing follows DruidUtils.isComplex
(reference: DruidUtils.java:17-21): anything not long/float/string/simple is
a complex (sketch) metric carried as binary.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from druid_hadoop_utils_spark.intervals import Interval, parse_intervals

SIMPLE_METRIC_TYPES = {"long", "float", "double", "string", "simple"}

GRANULARITIES = {
    "NONE",
    "SECOND",
    "MINUTE",
    "FIVE_MINUTE",
    "TEN_MINUTE",
    "FIFTEEN_MINUTE",
    "THIRTY_MINUTE",
    "HOUR",
    "SIX_HOUR",
    "DAY",
    "WEEK",
    "MONTH",
    "QUARTER",
    "YEAR",
    "ALL",
}


@dataclass(frozen=True)
class Metric:
    name: str
    type: str = "long"

    @property
    def is_complex(self) -> bool:
        """Complex-metric test, same rule as reference DruidUtils.java:17-21."""
        return self.type == "complex" or self.type not in SIMPLE_METRIC_TYPES


@dataclass
class LoadSpec:
    data_source: str | None = None
    interval: Interval | None = None
    granularity: str | dict = "NONE"
    dimensions: list[str] = field(default_factory=list)
    metrics: list[Metric] = field(default_factory=list)
    filter: dict | None = None
    # multi-interval queries (Druid's "intervals": [a, b, ...]): the full
    # condensed list. ``interval`` stays the single-interval convenience —
    # always intervals[0] when exactly one is set.
    intervals: list[Interval] = field(default_factory=list)
    # time-travel read (engine extension, JSON key "asOf"): resolve the
    # managed table's timeline as of this wall-clock instant (ISO string
    # or datetime; naive = UTC) — see sources/segments.list_manifests.
    # Ignored for plain-parquet / DataFrame sources, which have no
    # timeline to rewind.
    as_of: object | None = None

    def __post_init__(self) -> None:
        if self.intervals:
            self.intervals = parse_intervals(list(self.intervals))
        elif self.interval is not None:
            self.intervals = [self.interval]
        if self.interval is None and len(self.intervals) == 1:
            self.interval = self.intervals[0]
        if isinstance(self.granularity, str):
            g = self.granularity.upper()
            if g not in GRANULARITIES:
                raise ValueError(f"unknown granularity {self.granularity!r}")
            self.granularity = g
        elif isinstance(self.granularity, dict):
            if self.granularity.get("type") not in {"duration", "period"}:
                raise ValueError(f"unknown granularity spec {self.granularity!r}")
        norm = []
        for m in self.metrics:
            if isinstance(m, Metric):
                norm.append(m)
            elif isinstance(m, dict):
                norm.append(Metric(m["name"], m.get("type", "long")))
            else:
                norm.append(Metric(str(m)))
        self.metrics = norm

    @property
    def metric_names(self) -> list[str]:
        return [m.name for m in self.metrics]

    @property
    def columns(self) -> list[str]:
        """Declared output columns: time first, then dims, then metrics —
        same ordering as the reference tuple (DruidStorage.java:120-157)."""
        return ["__time", *self.dimensions, *self.metric_names]

    @classmethod
    def from_file(cls, path: str, data_source: str | None = None,
                  interval: str | Interval | None = None) -> "LoadSpec":
        """Read a schema file, like the reference's DruidStorage constructor
        arg (reference: DruidStorage.java:267-282 — HDFS → absolute local
        path → classpath; here: any local/DFS path readable by open())."""
        with open(path) as f:
            return cls.from_json(f.read(), data_source=data_source, interval=interval)

    @classmethod
    def from_json(cls, text: str | dict, data_source: str | None = None,
                  interval: str | Interval | None = None) -> "LoadSpec":
        """Parse either spec shape; explicit args override JSON fields."""
        obj = json.loads(text) if isinstance(text, str) else dict(text)
        ds = data_source or obj.get("dataSource")
        # the reference enforced exactly one interval
        # (DruidInputFormat.java:87-91); real Druid 0.9 clients send lists,
        # so we accept them — condensed, OR-ed at plan time
        ivs = parse_intervals(
            interval if interval is not None
            else obj.get("interval") or obj.get("intervals")
        )
        return cls(
            data_source=ds,
            intervals=ivs,
            granularity=obj.get("granularity") or "NONE",
            dimensions=list(obj.get("dimensions") or []),
            metrics=list(obj.get("metrics") or []),
            filter=obj.get("filter"),
            as_of=obj.get("asOf"),
        )


def parse_interval(text: str | Interval) -> Interval:
    return Interval.parse(text)
