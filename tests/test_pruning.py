"""Manifest column-stats segment pruning (plans/pruning.py): the
DimFilter→constraints reduction, the conservative exclusion proof, and
the end-to-end publish→filtered-load file-skipping path."""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.plans.pruning import (
    filter_constraints,
    segment_excluded,
)


class TestConstraints:
    def test_and_tree_collects_leaves(self):
        f = {"type": "and", "fields": [
            {"type": "selector", "dimension": "a", "value": "x"},
            {"type": "bound", "dimension": "b", "lower": "1", "upper": "9",
             "ordering": "numeric"},
            {"type": "in", "dimension": "a", "values": ["x", "y"]},
        ]}
        c = filter_constraints(f)
        assert len(c["a"]) == 2 and len(c["b"]) == 1

    def test_or_and_not_are_opaque(self):
        f = {"type": "or", "fields": [
            {"type": "selector", "dimension": "a", "value": "x"}]}
        assert filter_constraints(f) == {}
        f = {"type": "not", "field":
             {"type": "selector", "dimension": "a", "value": "x"}}
        assert filter_constraints(f) == {}

    def test_extraction_fn_leaves_are_opaque(self):
        f = {"type": "selector", "dimension": "a", "value": "x",
             "extractionFn": {"type": "substring", "index": 0, "length": 1}}
        assert filter_constraints(f) == {}

    def test_nested_or_under_and_only_drops_that_branch(self):
        f = {"type": "and", "fields": [
            {"type": "selector", "dimension": "a", "value": "x"},
            {"type": "or", "fields": [
                {"type": "selector", "dimension": "b", "value": "y"}]},
        ]}
        c = filter_constraints(f)
        assert set(c) == {"a"}


class TestExclusion:
    def test_selector_outside_range_excludes(self):
        st = {"d": {"min": "click", "max": "view"}}
        c = filter_constraints({"type": "selector", "dimension": "d", "value": "zzz"})
        assert segment_excluded(st, c) is True
        c = filter_constraints({"type": "selector", "dimension": "d", "value": "error"})
        assert segment_excluded(st, c) is False

    def test_in_excludes_only_when_all_values_outside(self):
        st = {"d": {"min": "b", "max": "c"}}
        out = filter_constraints({"type": "in", "dimension": "d", "values": ["a", "z"]})
        assert segment_excluded(st, out) is True
        mixed = filter_constraints({"type": "in", "dimension": "d", "values": ["a", "b"]})
        assert segment_excluded(st, mixed) is False

    def test_null_selector_never_prunes(self):
        st = {"d": {"min": "b", "max": "c"}}
        c = filter_constraints({"type": "selector", "dimension": "d", "value": None})
        assert segment_excluded(st, c) is False

    def test_numeric_bound_on_numeric_stats(self):
        st = {"u": {"min": 10, "max": 20}}
        gone = filter_constraints({"type": "bound", "dimension": "u",
                                   "lower": "21", "ordering": "numeric"})
        assert segment_excluded(st, gone) is True
        edge = filter_constraints({"type": "bound", "dimension": "u",
                                   "lower": "20", "ordering": "numeric"})
        assert segment_excluded(st, edge) is False
        strict = filter_constraints({"type": "bound", "dimension": "u",
                                     "lower": "20", "lowerStrict": True,
                                     "ordering": "numeric"})
        assert segment_excluded(st, strict) is True
        upper = filter_constraints({"type": "bound", "dimension": "u",
                                    "upper": "9", "ordering": "numeric"})
        assert segment_excluded(st, upper) is True

    def test_ordering_type_mismatch_never_prunes(self):
        # lexicographic bound over NUMERIC stats: "5" > "20" lexically —
        # pruning on it would be wrong, so it must not prune
        st = {"u": {"min": 10, "max": 20}}
        c = filter_constraints({"type": "bound", "dimension": "u", "lower": "5"})
        assert segment_excluded(st, c) is False
        # numeric bound over STRING stats: equally opaque
        st2 = {"d": {"min": "a", "max": "c"}}
        c2 = filter_constraints({"type": "bound", "dimension": "d",
                                 "lower": "5", "ordering": "numeric"})
        assert segment_excluded(st2, c2) is False

    def test_selector_coerces_to_numeric_stats(self):
        st = {"u": {"min": 10, "max": 20}}
        c = filter_constraints({"type": "selector", "dimension": "u", "value": "15"})
        assert segment_excluded(st, c) is False
        c = filter_constraints({"type": "selector", "dimension": "u", "value": "99"})
        assert segment_excluded(st, c) is True
        c = filter_constraints({"type": "selector", "dimension": "u", "value": "abc"})
        assert segment_excluded(st, c) is False  # uncoercible: keep

    def test_missing_stats_column_never_prunes(self):
        assert segment_excluded({"x": {"min": 1, "max": 2}},
                                filter_constraints(
                                    {"type": "selector", "dimension": "d",
                                     "value": "zzz"})) is False
        assert segment_excluded(None, {"d": [("in", ["z"])]}) is False


class TestEndToEnd:
    SPEC = {
        "granularity": "NONE",
        "dimensions": ["event_type"],
        "metrics": [{"name": "user_id", "type": "long"}],
    }

    def _root(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import publish_segments

        root = str(tmp_path / "pruned_table")
        rows = (
            [Row(ts=datetime(2024, 1, 1, h), event_type="click",
                 user_id=h) for h in range(4)]
            + [Row(ts=datetime(2024, 1, 2, h), event_type="view",
                   user_id=100 + h) for h in range(4)]
        )
        publish_segments(
            spark.createDataFrame(rows), root, "events", version="v1",
            time_column="ts", bucket="DAY",
            stats_columns=["event_type", "user_id"],
        )
        return root

    def _load(self, spark, root, flt, **kw):
        from druid_hadoop_utils_spark import load

        spec = dict(self.SPEC, filter=flt)
        return load(spark, root, spec, interval="2024-01-01/2024-01-05",
                    data_source="events", **kw)

    def test_stats_round_trip_manifest(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.segments import list_manifests

        root = self._root(spark, tmp_path)
        by_day = {m.interval.start.day: m.stats
                  for m in list_manifests(root, "events")}
        assert by_day[1]["event_type"] == {"min": "click", "max": "click"}
        assert by_day[1]["user_id"] == {"min": 0, "max": 3}
        assert by_day[2]["user_id"] == {"min": 100, "max": 103}

    def test_filter_skips_segment_files(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        df = self._load(spark, root, {"type": "selector",
                                      "dimension": "event_type",
                                      "value": "view"})
        files = df.inputFiles()
        assert files and all("2024-01-02" in f for f in files)
        assert df.count() == 4

    def test_numeric_bound_skips_segment(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        df = self._load(spark, root, {"type": "bound", "dimension": "user_id",
                                      "lower": "50", "ordering": "numeric"})
        assert all("2024-01-02" in f for f in df.inputFiles())
        assert df.count() == 4

    def test_opaque_filter_scans_everything(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        df = self._load(spark, root, {"type": "regex",
                                      "dimension": "event_type",
                                      "pattern": "^v"})
        files = df.inputFiles()
        assert any("2024-01-01" in f for f in files)
        assert any("2024-01-02" in f for f in files)  # no pruning
        # ...but the row-level filter still applies
        assert df.count() == 4

    def test_all_pruned_returns_empty_not_error(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        df = self._load(spark, root, {"type": "selector",
                                      "dimension": "event_type",
                                      "value": "zzz"})
        assert df.count() == 0
        assert df.columns == ["__time", "event_type", "user_id"]
        # and even with ignore_when_no_segments=False: provably-empty is
        # a RESULT, not a missing-segments error
        df2 = self._load(spark, root, {"type": "selector",
                                       "dimension": "event_type",
                                       "value": "zzz"},
                         ignore_when_no_segments=False)
        assert df2.count() == 0

    def test_results_equal_unpruned_path(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.segments import write_segment

        root = self._root(spark, tmp_path)
        # same data published WITHOUT stats: identical query results
        root2 = str(tmp_path / "unpruned_table")
        for day, et in [(1, "click"), (2, "view")]:
            rows = [Row(__time=datetime(2024, 1, day, h), event_type=et,
                        user_id=(0 if et == "click" else 100) + h)
                    for h in range(4)]
            write_segment(spark.createDataFrame(rows), root2, "events",
                          f"2024-01-0{day}/2024-01-0{day + 1}", "v1")
        flt = {"type": "bound", "dimension": "user_id",
               "lower": "2", "upper": "101", "ordering": "numeric"}
        a = sorted(map(tuple, self._load(spark, root, flt).collect()))
        b = sorted(map(tuple, self._load(spark, root2, flt).collect()))
        # click users 2,3 + view users 100,101 pass the bound
        assert a == b and len(a) == 4


def test_compaction_preserves_stats(spark, tmp_path):
    """Compacting a table whose manifests carry stats recomputes them on
    the compacted segments without the caller restating the columns."""
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.maintenance import compact_segments
    from druid_hadoop_utils_spark.sources.segments import list_manifests
    from druid_hadoop_utils_spark.sources.segments import (
        resolve_visible_windows,
    )
    from druid_hadoop_utils_spark.intervals import Interval

    root = str(tmp_path / "compact_stats")
    rows = [Row(ts=datetime(2024, 1, 1, h), event_type=t, user_id=u)
            for h, t, u in [(0, "a", 1), (6, "b", 2), (12, "c", 3)]]
    publish_segments(spark.createDataFrame(rows), root, "events",
                     version="v1", time_column="ts", bucket="HOUR",
                     stats_columns=["event_type", "user_id"])
    compact_segments(spark, root, "events",
                     "2024-01-01/2024-01-02", bucket="DAY")
    iv = Interval.parse("2024-01-01/2024-01-02")
    vis = resolve_visible_windows(list_manifests(root, "events"), iv)
    live = [w.manifest for w in vis if not w.manifest.tombstone]
    assert len(live) == 1
    assert live[0].stats == {
        "event_type": {"min": "a", "max": "c"},
        "user_id": {"min": 1, "max": 3},
    }


class TestReviewRegressions:
    """Pinned fixes from the round-4 session code review."""

    def test_empty_string_selector_never_prunes(self):
        # "" matches NULL-or-empty rows (filters._null_or_empty) and
        # min/max stats ignore NULLs — pruning on "" would drop them
        st = {"d": {"min": "b", "max": "c"}}
        c = filter_constraints({"type": "selector", "dimension": "d", "value": ""})
        assert segment_excluded(st, c) is False
        c = filter_constraints({"type": "in", "dimension": "d",
                                "values": ["", "zzz"]})
        assert segment_excluded(st, c) is False

    def test_empty_string_bound_edge_never_prunes(self):
        st = {"d": {"min": "b", "max": "c"}}
        c = filter_constraints({"type": "bound", "dimension": "d", "upper": ""})
        assert segment_excluded(st, c) is False

    def test_numeric_literal_vs_string_stats_never_prunes(self):
        # the row filter would CAST the string column to double — string
        # lexicographic pruning can't model that
        st = {"d": {"min": "5.00", "max": "5.00"}}
        c = filter_constraints({"type": "selector", "dimension": "d", "value": 5.0})
        assert segment_excluded(st, c) is False

    def test_beyond_double_exact_range_never_prunes(self):
        big = 2**53 + 1
        st = {"u": {"min": big, "max": big}}
        c = filter_constraints({"type": "selector", "dimension": "u",
                                "value": str(2**53)})
        assert segment_excluded(st, c) is False
        # and stats inside the range with a huge literal: equally opaque
        st2 = {"u": {"min": 10, "max": 20}}
        c2 = filter_constraints({"type": "selector", "dimension": "u",
                                 "value": str(big)})
        assert segment_excluded(st2, c2) is False

    def test_decimal_stats_column_serializes(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import publish_segments
        from druid_hadoop_utils_spark.sources.segments import list_manifests

        root = str(tmp_path / "decimal_stats")
        df = spark.createDataFrame(
            [Row(ts=datetime(2024, 1, 1), v=1.25), Row(ts=datetime(2024, 1, 1), v=2.5)]
        ).withColumn("v", F.col("v").cast("decimal(10,2)"))
        publish_segments(df, root, "d", version="v1", time_column="ts",
                         bucket="DAY", stats_columns=["v"])
        m = list_manifests(root, "d")[0]
        assert m.stats == {"v": {"min": 1.25, "max": 2.5}}


class TestBloom:
    def _bloom_of(self, values, dtype="str"):
        from druid_hadoop_utils_spark.plans.pruning import (
            BLOOM_K,
            bloom_position,
            pack_bloom,
        )

        pos = {bloom_position(v, s) for v in values for s in range(BLOOM_K)}
        return pack_bloom(pos, dtype)

    def test_absent_value_excludes_present_keeps(self):
        from druid_hadoop_utils_spark.plans.pruning import bloom_excludes

        bl = self._bloom_of(["alpha", "beta"])
        assert bloom_excludes(bl, ["gamma"]) is True
        assert bloom_excludes(bl, ["alpha"]) is False
        # mixed: one present value keeps the segment
        assert bloom_excludes(bl, ["gamma", "beta"]) is False

    def test_int_canonicalization(self):
        from druid_hadoop_utils_spark.plans.pruning import bloom_excludes

        bl = self._bloom_of(["42"], dtype="int")   # CAST(42L AS STRING)
        assert bloom_excludes(bl, ["42"]) is False     # present
        assert bloom_excludes(bl, ["042"]) is False    # normalizes to 42
        assert bloom_excludes(bl, [42.0]) is False     # integral float
        assert bloom_excludes(bl, ["99"]) is True
        assert bloom_excludes(bl, ["42.5"]) is False   # fractional: opaque

    def test_string_literals_not_normalized(self):
        from druid_hadoop_utils_spark.plans.pruning import bloom_excludes

        # a STRING column holding "042": literal "042" must hit, and the
        # distinct string "42" may prune
        bl = self._bloom_of(["042"], dtype="str")
        assert bloom_excludes(bl, ["042"]) is False
        assert bloom_excludes(bl, ["42"]) is True

    def test_empty_and_null_values_never_exclude(self):
        from druid_hadoop_utils_spark.plans.pruning import bloom_excludes

        bl = self._bloom_of(["alpha"])
        assert bloom_excludes(bl, [""]) is False
        assert bloom_excludes(bl, [None]) is False
        assert bloom_excludes(bl, []) is False
        assert bloom_excludes({"m": 8192, "k": 3}, ["x"]) is False  # malformed

    def test_spark_positions_match_python(self, spark):
        from druid_hadoop_utils_spark.plans.pruning import (
            bloom_position,
            bloom_position_expr,
        )

        df = spark.createDataFrame(
            [("alpha",), ("beta",), ("42",)], "v string")
        got = df.select(
            "v", *[bloom_position_expr(F.col("v"), s).alias(f"p{s}")
                   for s in range(3)]
        ).collect()
        for r in got:
            for s in range(3):
                assert r[f"p{s}"] == bloom_position(r["v"], s), (r["v"], s)

    def test_publish_bloom_prunes_overlapping_ranges(self, spark, tmp_path):
        """user ids INTERLEAVE across days (min/max can't discriminate);
        the bloom still skips the day that lacks the queried id."""
        from druid_hadoop_utils_spark import load
        from druid_hadoop_utils_spark.sources.ingest import publish_segments

        root = str(tmp_path / "bloom_table")
        rows = (
            [Row(ts=datetime(2024, 1, 1, h), user_id=u)
             for h, u in enumerate([1, 5, 9, 13])]
            + [Row(ts=datetime(2024, 1, 2, h), user_id=u)
               for h, u in enumerate([2, 6, 10, 14])]
        )
        publish_segments(spark.createDataFrame(rows), root, "events",
                         version="v1", time_column="ts", bucket="DAY",
                         stats_columns=["user_id"],
                         bloom_columns=["user_id"])
        spec = {"granularity": "NONE", "dimensions": [],
                "metrics": [{"name": "user_id", "type": "long"}],
                "filter": {"type": "selector", "dimension": "user_id",
                           "value": "6"}}
        df = load(spark, root, spec, interval="2024-01-01/2024-01-05",
                  data_source="events")
        # min/max overlap ([1,13] vs [2,14]) — only the bloom can prove
        # day 1 lacks user 6
        assert all("2024-01-02" in f for f in df.inputFiles())
        assert df.count() == 1

    def test_compaction_preserves_bloom(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import publish_segments
        from druid_hadoop_utils_spark.sources.maintenance import (
            compact_segments,
        )
        from druid_hadoop_utils_spark.sources.segments import (
            list_manifests,
            resolve_visible_windows,
        )
        from druid_hadoop_utils_spark.intervals import Interval

        root = str(tmp_path / "bloom_compact")
        rows = [Row(ts=datetime(2024, 1, 1, h), user_id=h) for h in range(3)]
        publish_segments(spark.createDataFrame(rows), root, "events",
                         version="v1", time_column="ts", bucket="HOUR",
                         bloom_columns=["user_id"])
        compact_segments(spark, root, "events", "2024-01-01/2024-01-02",
                         bucket="DAY")
        iv = Interval.parse("2024-01-01/2024-01-02")
        vis = resolve_visible_windows(list_manifests(root, "events"), iv)
        live = [w.manifest for w in vis if not w.manifest.tombstone]
        assert len(live) == 1
        assert "bloom" in (live[0].stats or {}).get("user_id", {})


class TestPruningSoundnessProperty:
    """Randomized end-to-end soundness: for ARBITRARY conjunctive filters,
    a stats+bloom table must return exactly the rows of an identical
    table published without any pruning metadata."""

    @pytest.fixture(scope="class")
    def tables(self, spark, tmp_path_factory):
        import random

        from druid_hadoop_utils_spark.sources.ingest import publish_segments

        rng = random.Random(20240814)
        base = tmp_path_factory.mktemp("prune_prop")
        rows = [
            Row(ts=datetime(2024, 1, 1 + rng.randrange(6), rng.randrange(24)),
                et=rng.choice(["a", "b", "c", "zz", ""]) or None,
                uid=rng.randrange(50))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows)
        roots = {}
        for tag, kw in [("pruned", dict(stats_columns=["et", "uid"],
                                        bloom_columns=["et", "uid"])),
                        ("plain", dict(stats_columns=[]))]:
            root = str(base / tag)
            publish_segments(df, root, "ev", version="v1", time_column="ts",
                             bucket="DAY", **kw)
            roots[tag] = root
        return roots

    def _filters(self):
        import random

        rng = random.Random(7)
        leaves = []
        for _ in range(40):
            kind = rng.choice(["selector", "in", "bound", "regex"])
            dim = rng.choice(["et", "uid"])
            if kind == "selector":
                v = rng.choice(["a", "zz", "", "nope", "7", "49", "050"])
                leaves.append({"type": "selector", "dimension": dim, "value": v})
            elif kind == "in":
                vs = rng.sample(["a", "b", "zz", "", "3", "7", "99"],
                                rng.randrange(1, 4))
                leaves.append({"type": "in", "dimension": dim, "values": vs})
            elif kind == "bound":
                lo, hi = sorted([str(rng.randrange(60)), str(rng.randrange(60))])
                leaves.append({"type": "bound", "dimension": dim,
                               "lower": lo, "upper": hi,
                               "ordering": rng.choice(["numeric",
                                                       "lexicographic"]),
                               "lowerStrict": rng.random() < 0.5})
            else:
                leaves.append({"type": "regex", "dimension": dim,
                               "pattern": rng.choice(["^a", "z+"])})
        rng.shuffle(leaves)
        singles = leaves[:20]
        ands = [{"type": "and", "fields": [leaves[i], leaves[i + 20]]}
                for i in range(10)]
        return singles + ands

    @pytest.mark.slow
    def test_random_filters_match_unpruned(self, spark, tables):
        from druid_hadoop_utils_spark import load

        for flt in self._filters():
            spec = {"granularity": "NONE", "dimensions": ["et"],
                    "metrics": [{"name": "uid", "type": "long"}],
                    "filter": flt}
            got = sorted(map(tuple, load(
                spark, tables["pruned"], spec,
                interval="2024-01-01/2024-02-01",
                data_source="ev").collect()))
            want = sorted(map(tuple, load(
                spark, tables["plain"], spec,
                interval="2024-01-01/2024-02-01",
                data_source="ev").collect()))
            assert got == want, flt


def test_explain_pruning_reports_reasons(spark, tmp_path):
    from druid_hadoop_utils_spark.plans.pruning import explain_pruning
    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    root = str(tmp_path / "explain_table")
    rows = (
        [Row(ts=datetime(2024, 1, 1, h), et="click", uid=h) for h in range(3)]
        + [Row(ts=datetime(2024, 1, 2, h), et="view", uid=100 + h)
           for h in range(3)]
    )
    publish_segments(spark.createDataFrame(rows), root, "ev", version="v1",
                     time_column="ts", bucket="DAY",
                     stats_columns=["et"], bloom_columns=["uid"])
    rep = {r["interval"][:10]: r for r in explain_pruning(
        root, "ev", "2024-01-01/2024-01-05",
        {"type": "and", "fields": [
            {"type": "selector", "dimension": "et", "value": "view"},
            {"type": "selector", "dimension": "uid", "value": "101"}]})}
    assert rep["2024-01-01"]["pruned"] is True
    assert rep["2024-01-01"]["reason"] in {"min/max on et", "bloom on uid"}
    assert rep["2024-01-02"]["pruned"] is False
    assert rep["2024-01-02"]["reason"] is None
    # bloom-only proof: a uid present nowhere on day 2 but no et conflict
    rep2 = {r["interval"][:10]: r for r in explain_pruning(
        root, "ev", "2024-01-01/2024-01-05",
        {"type": "selector", "dimension": "uid", "value": "1"})}
    assert rep2["2024-01-02"]["reason"] == "bloom on uid"
    assert rep2["2024-01-01"]["pruned"] is False


def test_bloom_integral_float_beyond_double_exact_never_excludes():
    from druid_hadoop_utils_spark.plans.pruning import (
        BLOOM_K,
        bloom_excludes,
        bloom_position,
        pack_bloom,
    )

    big = 2**53 + 1
    pos = {bloom_position(str(big), s) for s in range(BLOOM_K)}
    bl = pack_bloom(pos, "int")
    # float literal 2^53 double-equals 2^53+1 in the row filter; the
    # bloom (which only knows the exact string) must not prune
    assert bloom_excludes(bl, [float(2**53)]) is False
    # exact int literals stay exact at any magnitude: absent big+2 prunes
    assert bloom_excludes(bl, [big + 2]) is True
    assert bloom_excludes(bl, [big]) is False
