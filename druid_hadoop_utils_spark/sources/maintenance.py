"""Segment-table maintenance: compaction, interval drop, and vacuum.

Druid's compaction task rewrites many small segments of an interval into
fewer, larger ones under a NEW version — readers atomically flip via the
overshadow timeline, old data stays until vacuumed. Same model here:

- ``compact_segments``: read the currently-visible rows of an interval
  through the normal planner (so overshadow applies), republish them
  bucketed at the target granularity under a higher version. One Spark
  job; no read-side downtime.
- ``vacuum``: physically delete segments that are fully overshadowed for
  their whole interval (never visible to any query), manifest first so a
  crash mid-vacuum leaves only invisible orphans.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.segments import (
    MANIFEST_DIR,
    SegmentManifest,
    _safe,
    list_manifests,
    resolve_visible_windows,
)


def next_version(table_root: str, data_source: str, prefix: str = "compact",
                 manifests=None) -> str:
    """A version string lexicographically above every existing one
    (ISO-timestamp style, like Druid's publish versions). ``manifests``
    reuses a listing the caller already holds (restore_to)."""
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    if manifests is None:
        manifests = list_manifests(table_root, data_source)
    existing = max((m.version for m in manifests), default="")
    # ISO stamps sort above "v1"-style versions; belt-and-braces for exotic
    # existing versions: prefix with 'z' padding if needed
    version = f"{stamp}-{prefix}"
    while version <= existing:
        version = "z" + version
    return version


def compact_segments(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    interval: str | Interval,
    bucket: str = "DAY",
    files_per_bucket: int = 1,
    sort_by: list[str] | None = None,
    shards_per_bucket: int = 1,
    stats_columns: list[str] | None = None,
    bloom_columns: list[str] | None = None,
) -> list[SegmentManifest]:
    """Rewrite the visible rows of ``interval`` as fresh segments bucketed
    at ``bucket`` granularity under a new version (atomic flip).

    ``stats_columns``/``bloom_columns`` default to the UNION of the input
    segments' recorded stats/bloom columns, so manifest pruning metadata
    survives compaction (recomputed on the compacted buckets) without the
    caller re-stating it.

    Concurrency (round 9): compaction is read-modify-write — the same
    lost-update shape as row-level DML — so it runs under BOTH guards:
    the table's maintenance lease for its whole duration (a concurrent
    vacuum's snapshot rewrite could otherwise interleave with the
    rewrite, VERDICT r8 item 3) and the optimistic commit check at
    announce time (``ConcurrentWriteConflict`` if anything published
    into the interval between the entry read and the commit — without
    it, a merge landing mid-compaction would be silently erased by the
    compacted rewrite of the pre-merge rows)."""
    from druid_hadoop_utils_spark.sources.lease import maintenance_lease

    with maintenance_lease(table_root, data_source,
                           "compact_segments") as lease:
        return _compact_segments_locked(
            spark, table_root, data_source, interval, bucket,
            files_per_bucket, sort_by, shards_per_bucket, stats_columns,
            bloom_columns, lease)


def _compact_segments_locked(
    spark, table_root, data_source, interval, bucket, files_per_bucket,
    sort_by, shards_per_bucket, stats_columns, bloom_columns, lease,
) -> list[SegmentManifest]:
    from druid_hadoop_utils_spark.plans.planner import _interval_pred, _scan_segments
    from druid_hadoop_utils_spark.sources.dml import (
        _commit_announced,
        _entry_state,
        _unique_prefix,
    )
    from druid_hadoop_utils_spark.sources.segments import list_manifests

    iv = Interval.parse(interval)
    manifests = list_manifests(table_root, data_source)
    entry_fp, stamp_floor = _entry_state(manifests, [iv])
    if stats_columns is None or bloom_columns is None:
        seen_stats: list[str] = []
        seen_bloom: list[str] = []
        for m in manifests:
            for c, entry in (m.stats or {}).items():
                if "min" in entry and c not in seen_stats:
                    seen_stats.append(c)
                if "bloom" in entry and c not in seen_bloom:
                    seen_bloom.append(c)
        if stats_columns is None:
            stats_columns = seen_stats
        if bloom_columns is None:
            bloom_columns = seen_bloom
    df = _scan_segments(spark, table_root, data_source, iv,
                        manifests=manifests)
    # Clip to the compaction interval: a segment that is fully visible
    # WITHIN the interval may still hold rows outside it, and republishing
    # those under the new (highest) version would resurrect data that a
    # newer version had overshadowed elsewhere.
    df = df.where(_interval_pred(iv, F.col("__time")))
    from druid_hadoop_utils_spark.sources.segments import publish_stamp

    version = next_version(table_root, data_source,
                           prefix=_unique_prefix("compact"),
                           manifests=manifests)
    announced = publish_segments(
        df, table_root, data_source, version=version,
        bucket=bucket, files_per_bucket=files_per_bucket, sort_by=sort_by,
        shards_per_bucket=shards_per_bucket, stats_columns=stats_columns,
        bloom_columns=bloom_columns, register=False,
        published_at=publish_stamp(floor=stamp_floor),
    )
    # the Spark job above can be long: re-arm the TTL before committing
    lease.renew()
    _commit_announced(table_root, data_source, "compact_segments", [iv],
                      entry_fp, announced)
    return announced


def drop_interval(
    table_root: str,
    data_source: str,
    interval: str | Interval,
) -> SegmentManifest:
    """Logically DELETE an interval (Druid drop/kill semantics): publish a
    TOMBSTONE under a fresh highest version. The timeline makes every
    older segment of the interval invisible atomically — readers in
    flight keep their snapshot, new reads see no rows — and ``vacuum``
    then physically reclaims the hidden data. Metadata-only: no Spark
    job, no data rewrite, O(1) regardless of how much data it hides.

    The tombstone announces under the table's commit lease (as every
    registration path does): landing between a concurrent DML commit's
    timeline re-validation and its register, it would be silently
    overshadowed by the DML's higher version — the drop would report
    success and delete nothing (VERDICT r10 item 1)."""
    from druid_hadoop_utils_spark.sources.lease import commit_lease
    from druid_hadoop_utils_spark.sources.segments import register_manifest

    iv = Interval.parse(interval)
    # version minted INSIDE the lease: minted outside, a registration
    # racing in between next_version and the lease could out-version the
    # tombstone, leaving the drop silently inert
    with commit_lease(table_root, data_source, "drop_interval"):
        manifest = SegmentManifest(
            data_source=data_source,
            interval=iv,
            version=next_version(table_root, data_source, prefix="drop"),
            shard_num=0,
            path="",
            tombstone=True,
        )
        register_manifest(table_root, manifest)
    return manifest


def apply_retention(
    table_root: str,
    data_source: str,
    drop_before: datetime | str,
    dry_run: bool = False,
) -> list[SegmentManifest]:
    """Age-based retention (Druid drop rules): tombstone every interval
    that ends at or before ``drop_before``. Metadata-only and idempotent —
    intervals already hidden by a tombstone are skipped; run ``vacuum``
    afterwards to reclaim the bytes. Returns the tombstones published
    (or, under ``dry_run``, the ones that WOULD be).

    A real run holds the maintenance lease (VERDICT r8 item 3): the
    which-intervals-are-already-dark decision reads the visible timeline,
    and racing a ``restore_to`` through that window could tombstone
    intervals the restore just re-announced (or vice versa). ``dry_run``
    is read-only and takes no lease."""
    if dry_run:
        return _apply_retention_unlocked(table_root, data_source,
                                         drop_before, True)
    from druid_hadoop_utils_spark.sources.lease import maintenance_lease

    with maintenance_lease(table_root, data_source, "apply_retention"):
        return _apply_retention_unlocked(table_root, data_source,
                                         drop_before, False)


def _apply_retention_unlocked(
    table_root: str,
    data_source: str,
    drop_before: datetime | str,
    dry_run: bool,
) -> list[SegmentManifest]:
    from druid_hadoop_utils_spark.intervals import merge_adjacent

    if isinstance(drop_before, str):
        boundary = Interval.parse(f"1970-01-01/{drop_before}").end
    else:
        boundary = drop_before
    manifests = list_manifests(table_root, data_source)
    expired = [
        m.interval for m in manifests
        if not m.tombstone and m.interval.end <= boundary
    ]
    if not expired:
        return []
    # one tombstone per contiguous run, not per segment
    lo = min(iv.start for iv in expired)
    hi = max(iv.end for iv in expired)
    span = Interval(lo, hi)
    visible = resolve_visible_windows(manifests, span)
    # "already dark" is a property of the VISIBLE timeline, not of tombstone
    # interval equality: data backfilled ABOVE an old tombstone is visible
    # (and expired) even though a tombstone with the identical interval
    # exists below it. Skip an interval only when no live (non-tombstone)
    # window is visible anywhere inside it.
    live_windows = [
        w for ws in visible if not ws.manifest.tombstone for w in ws.windows
    ]
    targets = [
        iv for iv in merge_adjacent(sorted(set(expired), key=lambda i: i.start))
        if any(w.overlaps(iv) for w in live_windows)
    ]
    if dry_run:
        return [
            SegmentManifest(data_source, iv, "(dry-run)", 0, "", tombstone=True)
            for iv in targets
        ]
    return [drop_interval(table_root, data_source, iv) for iv in targets]


def vacuum(
    table_root: str,
    data_source: str,
    dry_run: bool = False,
    retain_history_s: float = 0.0,
    reclaim_staged_after_s: float = 24 * 3600,
    floor_as_of=None,
) -> list[str]:
    """Delete segments that are invisible for their ENTIRE interval (fully
    overshadowed). Returns the removed segment identifiers.

    Destructive maintenance SERIALIZES per table: the sweep runs under
    the table's maintenance lease (``sources/lease.py``) and refuses
    loudly (``MaintenanceLockHeld``) when a concurrent ``vacuum`` /
    ``compact_manifests`` / ``restore_to`` holds it — interleaved snapshot
    rewrites could otherwise resurrect manifests whose data dirs this
    sweep just deleted. ``dry_run`` is read-only and takes no lease.

    ``retain_history_s`` keeps time travel alive across vacuums (the
    Delta ``VACUUM ... RETAIN N HOURS`` shape): a segment is reclaimed
    only if it is invisible in EVERY ``as_of`` view from
    ``now - retain_history_s`` forward — checked exactly, by resolving
    the timeline at the cutoff and after each manifest announced since
    (between announces the view is constant, so those instants cover all
    of them). The history horizon then advances only to the cutoff, so
    ``as_of`` reads within the retention window keep working. The
    default (0) reclaims everything currently invisible and moves the
    horizon to now — maximum reclamation, no history.

    Named tags (``segments.create_tag``) are standing retention floors
    on top of either mode: the cutoff never passes the oldest tag's
    pinned instant, so every tagged view survives any vacuum until its
    tag is deleted.

    The manifest is deleted first: if the process dies before the data
    directory is removed, the leftover parquet is unreferenced and harmless.

    The sweep also reclaims STAGED ORPHANS (VERDICT r10 item 2): version
    dirs no manifest — live or overshadowed — references (a DML or
    compaction that died between its invisible staged write and its
    commit, or whose commit lease timed out before cleanup ran) and
    crashed publishes' ``_staging_*`` trees. Both are age-gated on mtime
    (``reclaim_staged_after_s``, default 24 h — far above any commit
    window) so an IN-FLIGHT writer's staged data is never yanked;
    reclaimed dirs are reported by path alongside the segment ids.

    ``floor_as_of`` (an instant or ISO stamp) pins the retention cutoff
    EXACTLY, the way named tags do — every view from that instant
    forward survives regardless of ``retain_history_s``. This is the
    change-feed consumer contract (round 13): a registered consumer
    checkpointed at stamp T diffs FROM the view at T next run, so
    ``maintain_table`` passes the oldest committed checkpoint here. An
    instant, not seconds, because an age re-measures ``now`` at sweep
    time and can land the horizon microseconds past the checkpoint.
    """
    if dry_run:
        return _vacuum_sweep(table_root, data_source, True,
                             retain_history_s, reclaim_staged_after_s,
                             floor_as_of=floor_as_of)
    from druid_hadoop_utils_spark.sources.lease import maintenance_lease

    with maintenance_lease(table_root, data_source, "vacuum"):
        return _vacuum_sweep(table_root, data_source, False,
                             retain_history_s, reclaim_staged_after_s,
                             floor_as_of=floor_as_of)


def _vacuum_sweep(
    table_root: str,
    data_source: str,
    dry_run: bool,
    retain_history_s: float,
    reclaim_staged_after_s: float = 24 * 3600,
    floor_as_of=None,
) -> list[str]:
    import json as _json

    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.segments import (
        _manifests_from_json,
        _parse_as_of,
        _published_within,
        history_horizon,
        list_tags,
    )

    fs = get_fs(table_root)
    raw_objs: dict = {}  # mfile -> parsed JSON, captured by the listing
    try:
        manifests = list_manifests(table_root, data_source,
                                   _raw_out=raw_objs)
    except FileNotFoundError:
        manifests = []
    if not manifests:
        # no timeline at all — only staged orphans can exist (a table
        # whose very first publish died before any manifest landed)
        return _reclaim_staged_orphans(
            fs, table_root, data_source, [], dry_run,
            reclaim_staged_after_s)
    lo = min(m.interval.start for m in manifests)
    hi = max(m.interval.end for m in manifests)
    span = Interval(lo, hi)
    # everything any surviving view still needs: the CURRENT timeline,
    # plus (under retention) each distinct as_of view since the cutoff
    visible = {w.manifest for w in resolve_visible_windows(manifests, span)}
    cutoff = None
    if retain_history_s > 0:
        from datetime import timedelta

        cutoff = datetime.now(timezone.utc) - timedelta(
            seconds=retain_history_s)
    # named tags (segments.create_tag) are STANDING retention floors:
    # every view from the oldest tag forward survives, so tagged reads
    # keep working and the horizon contract ("any as_of at or after the
    # horizon still resolves exactly") stays honest
    tag_floor = min(
        (_parse_as_of(t["asOf"])
         for t in list_tags(table_root, data_source)),
        default=None)
    if tag_floor is not None and (cutoff is None or tag_floor < cutoff):
        cutoff = tag_floor
    # an explicit instant floor (consumer checkpoints via
    # maintain_table) pins the cutoff exactly like a tag does
    if floor_as_of is not None:
        f = _parse_as_of(floor_as_of)
        if cutoff is None or f < cutoff:
            cutoff = f
    if cutoff is not None and cutoff > datetime.now(timezone.utc):
        # a future cutoff (a legacy future-dated tag; create_tag now
        # refuses them) would preserve only the current view while
        # writing a FUTURE horizon, bricking every as_of until then
        cutoff = datetime.now(timezone.utc)
    if cutoff is not None:
        prev_h = history_horizon(table_root, data_source)
        if prev_h is not None and prev_h > cutoff:
            # views before an existing horizon are already gone — no
            # point retaining segments only they would need
            cutoff = prev_h
        stamps = sorted({
            _parse_as_of(m.published_at) for m in manifests
            if m.published_at is not None
            and _parse_as_of(m.published_at) > cutoff
        })
        for t in [cutoff, *stamps]:
            subset = [m for m in manifests
                      if _published_within(m.published_at, t)]
            if subset:
                visible |= {
                    w.manifest
                    for w in resolve_visible_windows(subset, span)
                }
    by_file: dict[str, list[SegmentManifest]] = {}
    for m in manifests:
        mfile = m.manifest_file or fs.join(
            table_root, data_source, MANIFEST_DIR, f"{_safe(m.identifier)}.json"
        )
        by_file.setdefault(mfile, []).append(m)
    removed = []
    data_dirs: list[str] = []
    for mfile, members in by_file.items():
        # process the file's actual shape — a snapshot
        # (compact_manifests) holds many independent entries; simple and
        # group files are all-or-nothing as before (a multi-shard group
        # is removed only once EVERY shard it carries is invisible: the
        # shards share (interval, version), so the timeline makes them
        # visible or invisible together — belt and braces). The parsed
        # object comes from the LISTING pass above (raw_objs): re-reading
        # every file here doubled the sweep's GET count on object stores
        # (tools/delay_probe.py), and the lease guarantees nothing
        # rewrote them since.
        obj = raw_objs.get(mfile)
        if obj is None:
            try:
                obj = _json.loads(fs.read_text(mfile))
            except FileNotFoundError:
                continue
        if "snapshot" in obj:
            keep, drop = [], []
            for entry in obj["snapshot"]:
                ms = _manifests_from_json(entry, mfile)
                if any(m in visible for m in ms):
                    keep.append(entry)
                else:
                    drop.append((entry, ms))
            if not drop:
                continue
            removed.extend(m.identifier for _e, ms in drop for m in ms)
            if dry_run:
                continue
            # rewrite FIRST (atomic put), data dirs after: a crash leaves
            # unreferenced orphans, never dangling references
            if keep:
                fs.put_text(mfile, _json.dumps({"snapshot": keep}, indent=1))
            else:
                fs.delete_file(mfile)
            for _e, ms in drop:
                data_dirs.extend(m.path for m in ms if m.path)
            continue
        if any(m in visible for m in members):
            continue
        removed.extend(m.identifier for m in members)
        if dry_run:
            continue
        fs.delete_file(mfile)
        data_dirs.extend(m.path for m in members if m.path)
    # pool-parallel reclamation (fs.py bulk contract) — manifests are
    # already gone, so these dirs are unreferenced orphans at worst.
    # restore_to re-announces OLD segment dirs under a fresh version, so
    # one data dir can be referenced by several manifests: never delete
    # a dir a SURVIVING manifest still points at
    removed_ids = set(removed)
    surviving_paths = {m.path for m in manifests
                       if m.path and m.identifier not in removed_ids}
    fs.delete_dirs([p for p in data_dirs if p not in surviving_paths])
    if removed and not dry_run:
        # physical history is gone: advance the time-travel horizon so
        # list_manifests(as_of=<before it>) refuses loudly instead of
        # resolving a timeline missing the segments just deleted. With
        # retention the horizon moves only to the cutoff (everything at
        # or after it was provably preserved above); without, to "now"
        from druid_hadoop_utils_spark.sources.segments import (
            mark_history_horizon,
        )

        mark_history_horizon(
            table_root, data_source,
            stamp=cutoff.isoformat() if cutoff is not None else None)
    removed.extend(_reclaim_staged_orphans(
        fs, table_root, data_source, manifests, dry_run,
        reclaim_staged_after_s))
    # a crash-window duplicate (same entry in snapshot + standalone)
    # reports once
    seen: set = set()
    return [x for x in removed if not (x in seen or seen.add(x))]


def _reclaim_staged_orphans(
    fs,
    table_root: str,
    data_source: str,
    manifests: list[SegmentManifest],
    dry_run: bool,
    min_age_s: float,
) -> list[str]:
    """Reclaim never-announced data under the data-source root: version
    dirs (``<interval>/v=<version>``) that NO manifest entry — live or
    overshadowed — references, and crashed publishes' ``_staging_*``
    trees. These are writers that died (or lost their commit) between
    the invisible staged write and the announce; the crash contract
    keeps them harmless to readers, but at 100 TB a crashed big merge is
    a standing storage bill (sources/dml.py). Age-gated on mtime so an
    in-flight writer's staged dirs are never yanked — the gate is the
    load-bearing condition, exactly as in ``vacuum_materialized``.

    Paths are compared in the SPARK namespace (``fs.spark_url``) on both
    sides: manifests persist spark URLs while the walk yields fs-native
    paths, and the two differ on object-store schemes (the r10
    objectsim path-scheme lesson)."""
    import time as _time

    from druid_hadoop_utils_spark.sources.fs import prefix_age_s

    ds_root = fs.join(table_root, data_source)
    # spark_url is idempotent, so normalizing the (already-spark-URL)
    # manifest paths through it too keeps both sides in one namespace
    referenced = {fs.spark_url(m.path).rstrip("/")
                  for m in manifests if m.path}
    now = _time.time()

    def _old_enough(path: str) -> bool:
        # prefix_age_s handles virtual-dir prefixes (object stores
        # report no mtime for them) by falling back to the newest FILE
        # mtime; None = no trustworthy age = never old enough, because
        # refusing to reclaim an in-flight writer's staged tree is the
        # only safe answer (fs.py:prefix_age_s has the full rationale)
        age = prefix_age_s(fs, path, now=now)
        return age is not None and age >= min_age_s

    try:
        entries = fs.ls(ds_root)
    except (FileNotFoundError, OSError):
        return []
    reclaimed: list[str] = []
    doomed: list[str] = []
    for entry in entries:
        path = fs.join(ds_root, entry)
        if entry.startswith("_staging_"):
            if fs.isdir(path) and _old_enough(path):
                doomed.append(path)
                reclaimed.append(path)
            continue
        # metadata namespaces (_segments, _materialized, _result_cache,
        # markers) are underscore-prefixed; data lives in interval dirs
        if entry.startswith("_") or not fs.isdir(path):
            continue
        for ventry in fs.ls(path):
            if not ventry.startswith("v="):
                continue
            vdir = fs.join(path, ventry)
            if not fs.isdir(vdir):
                continue
            shard_urls = {
                fs.spark_url(fs.join(vdir, s)).rstrip("/")
                for s in fs.ls(vdir)
            }
            if shard_urls & referenced:
                continue
            if not _old_enough(vdir):
                continue
            doomed.append(vdir)
            reclaimed.append(vdir)
    if not dry_run and doomed:
        fs.delete_dirs(doomed)
    return reclaimed


def compaction_candidates(
    table_root: str,
    data_source: str,
    max_files_per_segment: int = 4,
    min_file_bytes: int = 16 * 1024 * 1024,
    interval: str | Interval = "1970-01-01/3000-01-01",
) -> list[dict]:
    """The auto-compaction advisor: scan the VISIBLE timeline's segment
    directories (driver-side metadata + directory stats only — no data
    read) and report segments whose file layout hurts readers: too many
    files, or files below ``min_file_bytes`` (small files dominate task
    scheduling and row-group stat overhead at scale — the same heuristic
    Druid's auto-compaction applies).

    Returns one dict per flagged segment: interval, version, shard,
    n_files, total_bytes, reasons. Feed each flagged interval to
    ``compact_segments`` (which rewrites and atomically flips it).
    """
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(table_root)
    iv = Interval.parse(interval)
    visible = resolve_visible_windows(list_manifests(table_root, data_source), iv)
    seen_paths = set()
    out = []
    for w in visible:
        seg = w.manifest
        if seg.tombstone or seg.path in seen_paths:
            continue
        seen_paths.add(seg.path)
        listed = fs.list_files(seg.path, suffix=".parquet")
        if not listed:
            continue
        files = [f for f, _sz in listed]
        sizes = [sz for _f, sz in listed]
        reasons = []
        if len(files) > max_files_per_segment:
            reasons.append(f"{len(files)} files > {max_files_per_segment}")
        small = sum(1 for s in sizes if s < min_file_bytes)
        if small and len(files) > 1:
            reasons.append(
                f"{small}/{len(files)} files under {min_file_bytes} bytes"
            )
        if reasons:
            out.append({
                "interval": str(seg.interval),
                "version": seg.version,
                "shard_num": seg.shard_num,
                "n_files": len(files),
                "total_bytes": sum(sizes),
                "reasons": reasons,
            })
    return out


def auto_compact(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    max_files_per_segment: int = 4,
    min_file_bytes: int = 16 * 1024 * 1024,
    bucket: str = "DAY",
    files_per_bucket: int = 1,
    dry_run: bool = False,
    compact_manifests_over: int | None = 256,
    max_buckets_per_job: int = 32,
    target_file_bytes: int | None = None,
) -> list[str]:
    """Apply the auto-compaction advisor: every flagged interval is
    rewritten through ``compact_segments`` (new version, atomic flip;
    stats/blooms carried automatically). Returns the ISO intervals
    flagged and compacted (or, with ``dry_run=True``, the ones that
    WOULD be; ``compaction_plan`` additionally previews the coalesced
    rewrite JOBS).

    ``target_file_bytes`` sizes each job's output BY BYTES instead of
    the fixed ``files_per_bucket``: per span, files_per_bucket =
    ceil(mean flagged bytes per bucket / target). This is the knob
    that matters at 100 TB — a day bucket holding 300 GB must not
    collapse to ONE file (one write task, one read split, no
    parallelism downstream); at target 512 MB it becomes ~600 files.
    The estimate comes from the advisor's own measured per-segment
    listing (flagged bytes only — co-bucket unflagged data adds to the
    true size, so treat the target as a sizing knob, not a ceiling)
    and is clamped to [1, 4096] per bucket.

    ADJACENT (or overlapping) flagged intervals coalesce into ONE
    rewrite job over their contiguous span (round 14): a 1000-day
    small-file backlog — the shape a paused maintenance cron leaves
    behind — submits ~1000/``max_buckets_per_job`` Spark jobs instead
    of 1000. Identical result rows and bucket layout: the span rewrite
    re-buckets at ``bucket`` granularity exactly as the per-interval
    rewrites would, under one version instead of N. Non-contiguous
    flags never merge (the gap's unflagged data is not rewritten), and
    ``max_buckets_per_job`` caps a single job's flagged-bucket count so
    one failure never rolls back an unbounded rewrite. This is the
    Druid auto-compaction loop as a callable: schedule it after ingest
    waves, not per publish.

    When the table's ``_segments/`` directory holds more than
    ``compact_manifests_over`` metadata files, the sweep also folds them
    into one snapshot (``segments.compact_manifests``) so planning stays
    one metadata read at object-store scale; None disables."""
    # ONE plan builder for preview and run: the dry-run list, the jobs
    # the operator previewed, and the jobs this call submits can never
    # drift (they are the same compaction_plan output).
    plan = compaction_plan(
        table_root, data_source,
        max_files_per_segment=max_files_per_segment,
        min_file_bytes=min_file_bytes,
        max_buckets_per_job=max_buckets_per_job,
        bucket=bucket, target_file_bytes=target_file_bytes,
    )
    intervals = plan["intervals"]
    if dry_run:
        return intervals
    for job in plan["jobs"]:
        compact_segments(spark, table_root, data_source, job["span"],
                         bucket=bucket,
                         files_per_bucket=(job["files_per_bucket"]
                                           or files_per_bucket))
    if compact_manifests_over is not None:
        from druid_hadoop_utils_spark.sources.fs import get_fs
        from druid_hadoop_utils_spark.sources.segments import (
            compact_manifests,
        )

        fs = get_fs(table_root)
        mdir = fs.join(table_root, data_source, MANIFEST_DIR)
        n = len([x for x in fs.ls(mdir)
                 if x.endswith(".json") and not x.startswith("_")])
        if n > compact_manifests_over:
            compact_manifests(table_root, data_source)
    return intervals


def _bucket_count(span: Interval, bucket: str) -> int:
    """How many OUTPUT buckets of ``bucket`` granularity the rewrite of
    ``span`` produces (UTC-pinned truncation, same convention as
    ``granularity_expr``). Rewrites only emit buckets holding rows, so
    this is an upper bound — the right denominator for mean-bytes
    sizing."""
    from datetime import timedelta

    s, e = span.start, span.end
    if bucket == "HOUR":
        s = s.replace(minute=0, second=0, microsecond=0)
        n = 0
        while s < e:
            n += 1
            s += timedelta(hours=1)
        return n
    if bucket == "DAY":
        s = s.replace(hour=0, minute=0, second=0, microsecond=0)
        n = 0
        while s < e:
            n += 1
            s += timedelta(days=1)
        return n
    if bucket == "MONTH":
        n = (e.year - s.year) * 12 + (e.month - s.month)
        # a partial trailing month (or a sub-month span) still emits one
        if (e.day, e.hour, e.minute, e.second, e.microsecond) != (
                1, 0, 0, 0, 0) or n == 0:
            n += 1
        return n
    raise ValueError(f"unsupported bucket granularity: {bucket!r}")


def _span_files_per_bucket(span: Interval, flagged: list[dict],
                           target_file_bytes: int, bucket: str) -> int:
    """Byte-targeted output sizing for one coalesced rewrite job: total
    flagged bytes in the span divided by the number of OUTPUT buckets
    the rewrite produces at ``bucket`` granularity, divided by the
    target, clamped to [1, 4096]. Keying on output buckets (not
    flagged-interval count) keeps the sizing right when advisor
    granularity differs from the rewrite granularity — 30 flagged DAY
    segments re-bucketed at MONTH size the ONE month bucket by their
    summed bytes; one flagged MONTH segment re-bucketed at DAY spreads
    its bytes over ~30 day buckets. Uses the advisor's already-measured
    listing — no extra filesystem round-trips."""
    import math

    total = sum(int(c["total_bytes"]) for c in flagged
                if span.start <= Interval.parse(c["interval"]).start
                and Interval.parse(c["interval"]).end <= span.end)
    if total <= 0:
        return 1
    mean = total / _bucket_count(span, bucket)
    return max(1, min(4096, math.ceil(mean / target_file_bytes)))


def compaction_plan(
    table_root: str,
    data_source: str,
    *,
    max_files_per_segment: int = 4,
    min_file_bytes: int = 16 * 1024 * 1024,
    max_buckets_per_job: int = 32,
    bucket: str = "DAY",
    target_file_bytes: int | None = None,
) -> dict:
    """What ``auto_compact`` WOULD do, as the operator-facing preview
    (NOTES r14 item 5): the advisor's flagged candidates, their
    distinct intervals, and — the part ``dry_run`` alone doesn't show —
    the coalesced SPANS, i.e. the actual rewrite jobs with their
    flagged-member counts. Read-only, driver-side metadata only, no
    lease. Keys:

    - ``flagged``: the raw ``compaction_candidates`` rows (reasons,
      file counts, bytes);
    - ``intervals``: the distinct flagged ISO intervals (what
      ``auto_compact(dry_run=True)`` returns);
    - ``jobs``: one entry per coalesced rewrite job —
      ``{"span": iso, "flagged_members": n, "files_per_bucket": f}`` —
      under the same ``max_buckets_per_job`` geometry the real run
      uses, so an operator sizing a backlog drain sees the REAL job
      count (2 jobs for a 30-day contiguous backlog at the default
      cap, not 30). ``files_per_bucket`` is the byte-targeted sizing
      the run would apply when ``target_file_bytes`` is set (None
      otherwise — the caller's fixed value applies); pass the same
      ``bucket`` granularity the run will use — the sizing denominator
      is the span's OUTPUT bucket count at that granularity.

    ``auto_compact`` executes exactly this plan (it calls this
    function), so preview and run cannot drift.
    """
    flagged = compaction_candidates(
        table_root, data_source,
        max_files_per_segment=max_files_per_segment,
        min_file_bytes=min_file_bytes,
    )
    intervals = sorted({c["interval"] for c in flagged})
    ivs = [Interval.parse(s) for s in intervals]
    jobs = []
    for span in _coalesce_spans(intervals, max_buckets_per_job):
        members = sum(1 for iv in ivs
                      if span.start <= iv.start and iv.end <= span.end)
        jobs.append({
            "span": str(span),
            "flagged_members": members,
            "files_per_bucket": (
                _span_files_per_bucket(span, flagged, target_file_bytes,
                                       bucket)
                if target_file_bytes else None),
        })
    return {"flagged": flagged, "intervals": intervals, "jobs": jobs}


def _coalesce_spans(intervals: list[str],
                    max_buckets_per_job: int) -> list[Interval]:
    """Group sorted flagged intervals into contiguous spans, each
    covering at most ``max_buckets_per_job`` flagged members. Touching
    (``end == next.start``) or overlapping members extend the span; a
    gap — unflagged data that must NOT be rewritten — always starts a
    new one.

    The cap only splits at a TOUCH point (``iv.start == cur_end``): a
    member that strictly OVERLAPS the current span keeps merging even
    at the cap, because splitting there would emit two overlapping
    compact jobs that redundantly rewrite the overlap under two
    versions (ADVICE r14) — wasted work and a wider optimistic-conflict
    window. Overlapping flags only arise from mixed-granularity
    advisories, and an overlap never adds a full cap-unit of distinct
    buckets, so the blast-radius bound degrades by at most the
    overlapping members' excess — correctness of "no two jobs rewrite
    the same bucket" wins over an exact member count."""
    ivs = sorted({Interval.parse(s) for s in intervals})
    spans: list[Interval] = []
    cur_start = cur_end = None
    count = 0
    for iv in ivs:
        if (cur_start is not None and iv.start <= cur_end
                and (count < max_buckets_per_job or iv.start < cur_end)):
            cur_end = max(cur_end, iv.end)
            count += 1
        else:
            if cur_start is not None:
                spans.append(Interval(cur_start, cur_end))
            cur_start, cur_end, count = iv.start, iv.end, 1
    if cur_start is not None:
        spans.append(Interval(cur_start, cur_end))
    return spans


def table_stats(table_root: str, data_source: str) -> dict:
    """Ops summary of a managed table — the coordinator-view numbers,
    driver-side metadata + directory stats only (no data read): visible /
    overshadowed / tombstone segment counts, file count and bytes of the
    VISIBLE set, distinct versions, the covered time span, the time-travel
    horizon, the named tags (with their pinned instants), and the
    consumer-lag gauge (round 14: registered change-feed consumers —
    count, slowest name, worst ``behind_s``, unreadable-checkpoint
    count — the number an operator alarms on before a consumer falls
    off the vacuum horizon)."""
    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.segments import (
        history_horizon,
        list_tags,
    )

    fs = get_fs(table_root)
    manifests = list_manifests(table_root, data_source)
    if not manifests:
        raise FileNotFoundError(
            f"no segments for {data_source} under {table_root}")
    everything = Interval.parse("0001-01-01T00:00:00/9999-12-31T00:00:00")
    visible = resolve_visible_windows(manifests, everything)
    vis_set = {w.manifest for w in visible}
    live = [w.manifest for w in visible if not w.manifest.tombstone]
    n_files = 0
    n_bytes = 0
    for m in {m.path: m for m in live}.values():
        listed = fs.list_files(m.path, suffix=".parquet", recursive=True)
        n_files += len(listed)
        n_bytes += sum(sz for _f, sz in listed)
    spans = [m.interval for m in live]
    return {
        "data_source": data_source,
        "segments_total": len(manifests),
        "segments_visible": len([m for m in vis_set if not m.tombstone]),
        "segments_overshadowed": len(
            [m for m in manifests if m not in vis_set]),
        "tombstones": len([m for m in manifests if m.tombstone]),
        "versions": sorted({m.version for m in manifests}),
        "visible_files": n_files,
        "visible_bytes": n_bytes,
        "time_min": min(s.start for s in spans).isoformat() if spans else None,
        "time_max": max(s.end for s in spans).isoformat() if spans else None,
        "history_horizon": (lambda h: h.isoformat() if h else None)(
            history_horizon(table_root, data_source)),
        "tags": {t["name"]: t["asOf"]
                 for t in list_tags(table_root, data_source)},
        "consumers": _consumer_gauge(table_root, data_source),
    }


def _consumer_gauge(table_root: str, data_source: str) -> dict:
    """The registered-consumer summary for ``table_stats`` — one pooled
    ``list_consumers`` pass folded to the four alarm numbers. A consumer
    that never committed has ``behind_s`` None (first run is a full
    snapshot by design) and doesn't count as lagging; an unreadable
    checkpoint counts in ``errors`` (and will make ``maintain_table``
    skip vacuum until repaired)."""
    from druid_hadoop_utils_spark.sources.changes import list_consumers

    try:
        lags = list_consumers(table_root, data_source)
    except FileNotFoundError:
        # registered checkpoints but no stamped manifests (pre-stamp
        # legacy table): lag is UNDEFINED, but the consumers still
        # EXIST — report the real registered count (shared
        # registered_consumer_names listing, so this can never disagree
        # with list_consumers) rather than 0 (ADVICE r14).
        # behind_s/slowest stay None: nothing to lag against until a
        # stamped manifest lands.
        from druid_hadoop_utils_spark.sources.changes import (
            registered_consumer_names,
        )

        n = len(registered_consumer_names(table_root, data_source))
        return {"registered": n, "slowest": None, "max_behind_s": None,
                "errors": []}
    errors = sorted(n for n, lag in lags.items() if "error" in lag)
    behind = {n: lag["behind_s"] for n, lag in lags.items()
              if lag.get("behind_s") is not None}
    slowest = max(behind, key=behind.get) if behind else None
    return {
        "registered": len(lags),
        "slowest": slowest,
        "max_behind_s": behind[slowest] if slowest else None,
        "errors": errors,
    }


def maintain_table(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    *,
    max_files_per_segment: int = 4,
    min_file_bytes: int = 16 * 1024 * 1024,
    bucket: str = "DAY",
    files_per_bucket: int = 1,
    compact_manifests_over: int | None = 256,
    retain_history_s: float = 0.0,
    materialized_min_age_s: float = 6 * 3600,
    strict: bool = True,
    target_file_bytes: int | None = None,
) -> dict:
    """The whole maintenance cron in ONE call — what an operator
    schedules per table instead of wiring five sweeps by hand:

    1. ``auto_compact`` — advisor-flagged intervals rewritten, manifest
       files folded into a snapshot past ``compact_manifests_over``;
       ``target_file_bytes`` switches output sizing from the fixed
       ``files_per_bucket`` to byte-targeted (see ``auto_compact``).
    2. ``vacuum`` — fully-overshadowed segments and staged orphans
       reclaimed (the timeline version settles HERE, which is why the
       derived-state steps run after it). The cutoff FLOORS at the
       oldest REGISTERED consumer checkpoint instant
       (``changes.consumers_floor_as_of`` via ``vacuum(floor_as_of=)``,
       exactly the way tags pin instants), so an incremental consumer
       never silently falls off the history horizon; the applied floor
       is reported as ``consumer_floor_as_of``. If the floor CANNOT be
       determined (the floor step raises), vacuum is SKIPPED for this
       cycle rather than run unfloored — deferring reclamation is safe,
       reclaiming past an unknown checkpoint is not.
    3. ``catch_up_materialized`` — every materialization's pending
       markers (registered by DML commits, publishes, and the
       compaction in step 1) recomputed, O(affected) only; markers for
       identifiers step 2 vacuumed clear without work.
    4. ``compact_postings`` for each ``ivf_postings`` materialization —
       the per-segment union collapsed to one cell-partitioned tree
       named by the NOW-SETTLED timeline version (running it before the
       vacuum would name a tree the vacuum immediately stales).
    5. ``vacuum_materialized`` per materialization — states of vacuumed
       segments plus stale compact trees (age-gated by
       ``materialized_min_age_s`` so in-flight lazy readers finish).

    Each destructive step takes the same leases it takes standalone
    (maintenance lease for vacuum/compaction, commit lease per
    registration chunk) — this wrapper adds sequencing, not a new lock
    scope, so it is safe beside concurrent DML/publish traffic.

    Returns a report dict (``compacted``, ``vacuumed``, ``caught_up``,
    ``postings_compacted``, ``materialized_vacuumed``, ``errors``).
    With ``strict`` (default) any per-step failure re-raises AFTER the
    remaining independent steps ran — a broken materialization never
    blocks table vacuum; ``strict=False`` returns the errors in the
    report for the caller's alerting instead."""
    from druid_hadoop_utils_spark.sources.materialize import (
        catch_up_materialized,
        compact_postings,
        list_materializations,
        vacuum_materialized,
    )

    report: dict = {"compacted": [], "vacuumed": [], "caught_up": {},
                    "postings_compacted": {}, "materialized_vacuumed": {},
                    "errors": []}

    _FAILED = object()  # sentinel: step RAISED (vs. legitimately None)

    def _step(label, fn, failed=None):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — aggregated, re-raised
            # the exception CLASS is part of the report: an operator
            # (or a test) must be able to tell a loud optimistic
            # refusal (ConcurrentWriteConflict — benign, next cycle
            # retries) from a real failure without parsing prose
            report["errors"].append(f"{label}: {type(e).__name__}: {e}")
            return failed

    out = _step("auto_compact", lambda: auto_compact(
        spark, table_root, data_source,
        max_files_per_segment=max_files_per_segment,
        min_file_bytes=min_file_bytes, bucket=bucket,
        files_per_bucket=files_per_bucket,
        compact_manifests_over=compact_manifests_over,
        target_file_bytes=target_file_bytes))
    report["compacted"] = out or []
    # retention floors at the SLOWEST registered consumer (round 13):
    # vacuuming past a lagging consumer's checkpoint destroys the view
    # its next consume_changes diffs FROM — it would be forced to
    # re-baseline with a full snapshot instead of an O(changed bytes)
    # catch-up. Registered checkpoints (consumer_checkpoint_path) are
    # discoverable; ad-hoc checkpoint paths still work but must size
    # retain_history_s themselves.
    from druid_hadoop_utils_spark.sources.changes import (
        consumers_floor_as_of,
    )

    floor = _step("consumers_floor_as_of",
                  lambda: consumers_floor_as_of(table_root, data_source),
                  failed=_FAILED)
    if floor is _FAILED:
        # the floor step RAISED (corrupt checkpoint, transient FS
        # error): the slowest consumer's instant is UNKNOWN, so running
        # vacuum anyway would run it unfloored — destructively
        # reclaiming views a lagging consumer still needs, the exact
        # failure the floor exists to prevent. Skip vacuum this cycle
        # (a later run retries; deferring reclamation is always safe)
        # and record the skip beside the floor error.
        report["consumer_floor_as_of"] = None
        report["errors"].append(
            "vacuum: skipped — consumer floor undetermined "
            "(consumers_floor_as_of failed; see its error)")
        report["vacuumed"] = []
    else:
        report["consumer_floor_as_of"] = floor
        out = _step("vacuum", lambda: vacuum(
            table_root, data_source, retain_history_s=retain_history_s,
            floor_as_of=floor))
        report["vacuumed"] = out or []
    out = _step("catch_up_materialized", lambda: catch_up_materialized(
        spark, table_root, data_source))
    report["caught_up"] = out or {}
    mats = _step("list_materializations", lambda: list_materializations(
        table_root, data_source)) or {}
    for name, spec in sorted(mats.items()):
        if spec.get("kind") == "ivf_postings":
            p = _step(f"compact_postings[{name}]", lambda n=name:
                      compact_postings(spark, table_root, data_source, n))
            if p is not None:
                report["postings_compacted"][name] = p
    for name in sorted(mats):
        out = _step(f"vacuum_materialized[{name}]", lambda n=name:
                    vacuum_materialized(table_root, data_source, n,
                                        tmp_min_age_s=materialized_min_age_s))
        report["materialized_vacuumed"][name] = out or []
    if strict and report["errors"]:
        raise RuntimeError(
            "maintain_table completed with step failures: "
            + "; ".join(report["errors"]))
    return report


def _subtract_intervals(iv: Interval, covers: list[Interval]) -> list[Interval]:
    """Pieces of ``iv`` not covered by ``covers`` (sorted, merged)."""
    out: list[Interval] = []
    s = iv.start
    for c in covers:
        if c.end <= s or c.start >= iv.end:
            continue
        if c.start > s:
            out.append(Interval(s, min(c.start, iv.end)))
        s = max(s, c.end)
        if s >= iv.end:
            break
    if s < iv.end:
        out.append(Interval(s, iv.end))
    return out


def restore_to(
    table_root: str,
    data_source: str,
    as_of,
    dry_run: bool = False,
) -> list[SegmentManifest]:
    """Make the CURRENT view equal the view at ``as_of`` (an instant or a
    named tag) — the Delta ``RESTORE`` analogue, metadata-only: the old
    view's segments are RE-ANNOUNCED under a fresh highest version
    pointing at their EXISTING data dirs (no data copied, O(manifests)
    regardless of data size), and intervals that only gained data after
    the instant are tombstoned at the same version. Undo for a bad
    publish, compaction, or drop — instant at any scale.

    The restore is itself a stamped announce, so it composes with the
    rest of the MVCC story: time travel to just before the restore still
    shows the bad state (auditable), the result cache and materialized
    states invalidate via the timeline version, and a later ``vacuum``
    reclaims what the restore hid — without touching re-announced data
    dirs, which more than one manifest now references (the vacuum keeps
    any dir a surviving manifest still points at).

    Refuses when the ``as_of`` view contains a PARTIALLY overshadowed
    segment (re-announcing it whole would resurrect rows hidden at that
    instant — use ``clone_view`` to materialize such a view exactly),
    when the instant predates the vacuum horizon (that history is gone),
    and when no manifest was announced by the instant (an empty view —
    restoring to it would tombstone the whole table behind a typo).

    The restore version is an ISO-stamp string above every existing
    version; publish LATER corrections with ``next_version()`` (or any
    string above the restore's) — a manually-chosen ``"v3"``-style
    version sorts below it and would be announced but never visible.

    The whole restore is announced in ONE snapshot-shaped manifest
    file — a single atomic put on every backend, so a crash can never
    leave a half-restored view.

    Returns the manifests announced (re-announces + tombstones); with
    ``dry_run`` they are returned unregistered.

    A real restore runs under the table's maintenance lease
    (``sources/lease.py``) — racing a vacuum/compaction sweep could
    re-announce data dirs the sweep is concurrently deleting. ``dry_run``
    is read-only and takes no lease.
    """
    if dry_run:
        return _restore_to_locked(table_root, data_source, as_of, True)
    from druid_hadoop_utils_spark.sources.lease import maintenance_lease

    with maintenance_lease(table_root, data_source, "restore_to"):
        return _restore_to_locked(table_root, data_source, as_of, False)


def _restore_to_locked(
    table_root: str,
    data_source: str,
    as_of,
    dry_run: bool,
) -> list[SegmentManifest]:
    from druid_hadoop_utils_spark.intervals import merge_adjacent
    from druid_hadoop_utils_spark.sources.segments import (
        publish_stamp,
        resolve_as_of,
    )

    from druid_hadoop_utils_spark.sources.segments import (
        _parse_as_of,
        _published_within,
        history_horizon,
    )

    resolved = resolve_as_of(table_root, data_source, as_of)
    # ONE metadata listing: the as_of view is a pure in-memory filter of
    # it, and next_version derives from it too (clone_view's round-trip
    # principle — a 10k-manifest object-store table must not pay 3x)
    current = list_manifests(table_root, data_source)
    if not current:
        raise FileNotFoundError(
            f"no segments for {data_source} under {table_root}")
    inst = _parse_as_of(resolved)
    horizon = history_horizon(table_root, data_source)
    if horizon is not None and inst < horizon:
        raise ValueError(
            f"cannot restore {data_source} to {as_of!r}: it predates the "
            f"history horizon {horizon.isoformat()} (that view was "
            "physically vacuumed)")
    old = [m for m in current if _published_within(m.published_at, inst)]
    if not old:
        # an instant before the first stamped publish: the "view" is an
        # EMPTY table — restoring to it would tombstone everything, an
        # irreversible mass-delete hiding behind a typo'd year. Refuse,
        # exactly as load(as_of=<pre-history>) refuses to read.
        raise FileNotFoundError(
            f"cannot restore {data_source} to {as_of!r}: no manifest was "
            "announced by that instant (an empty historical view — use "
            "drop_interval to intentionally empty a table)")
    lo = min(m.interval.start for m in current)
    hi = max(m.interval.end for m in current)
    span = Interval(lo, hi)
    old_vis = [w for w in resolve_visible_windows(old, span)
               if not w.manifest.tombstone]
    cur_vis = [w for w in resolve_visible_windows(current, span)
               if not w.manifest.tombstone]
    # no-op when the views already coincide — compared by (data dir,
    # visibility windows), the view's CONTENT identity, so a restore to
    # an already-restored instant (new manifest ids, same data) and a
    # "restore to now" are both clean no-ops. Checked BEFORE the
    # partial-refusal for the same reason.
    old_sig = {(w.manifest.path, w.windows) for w in old_vis}
    cur_sig = {(w.manifest.path, w.windows) for w in cur_vis}
    if old_sig == cur_sig:
        return []
    partial = [w.manifest.identifier for w in old_vis
               if not w.is_fully_visible(span)]
    if partial:
        raise ValueError(
            f"cannot restore {data_source} to {as_of!r}: segment(s) "
            f"{partial} were only PARTIALLY visible at that instant — "
            "re-announcing them whole would resurrect overshadowed rows; "
            "clone_view the as_of view instead"
        )
    version = next_version(table_root, data_source, prefix="restore",
                           manifests=current)
    stamp = publish_stamp()
    announced: list[SegmentManifest] = []
    # re-announce the old view's segments, keeping shard groups atomic
    groups: dict[tuple, list[SegmentManifest]] = {}
    for w in old_vis:
        m = w.manifest
        groups.setdefault((m.interval.iso(), m.version), []).append(
            SegmentManifest(data_source, m.interval, version, m.shard_num,
                            m.path, stats=m.stats, published_at=stamp))
    # intervals where the CURRENT view has rows but the old view had
    # none: tombstone them at the same restore version
    old_cover = merge_adjacent(sorted(
        {w.manifest.interval for w in old_vis}, key=lambda i: i.start))
    to_hide: list[Interval] = []
    for w in cur_vis:
        for piece in w.windows:
            to_hide.extend(_subtract_intervals(piece, old_cover))
    to_hide = merge_adjacent(sorted(set(to_hide), key=lambda i: i.start))
    tombstones = [
        SegmentManifest(data_source, iv, version, 0, "", tombstone=True,
                        published_at=stamp)
        for iv in to_hide
    ]
    planned = [m for ms in groups.values() for m in ms] + tombstones
    if dry_run:
        return planned
    # ONE snapshot-shaped manifest file holds every announce, so the
    # whole restore flips in a single atomic put on every backend — a
    # crash can never leave a mixed half-restored view (per-file
    # registration would). vacuum/compact_manifests already speak the
    # snapshot shape per-entry.
    import json as _json
    import uuid as _uuid

    from druid_hadoop_utils_spark.sources.dml import ConcurrentWriteConflict
    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.lease import commit_lease
    from druid_hadoop_utils_spark.sources.segments import (
        SNAPSHOT_PREFIX,
        _safe,
    )

    entries: list[dict] = []
    for ms in sorted(groups.values(),
                     key=lambda g: g[0].interval.start):
        if len(ms) > 1:
            entries.append({
                "dataSource": data_source,
                "interval": ms[0].interval.iso(),
                "version": version,
                "publishedAt": stamp,
                "shards": [
                    {"shardNum": m.shard_num, "path": m.path,
                     **({"stats": m.stats} if m.stats else {})}
                    for m in sorted(ms, key=lambda m: m.shard_num)
                ],
            })
        else:
            entries.append(ms[0].to_json())
    entries.extend(t.to_json() for t in tombstones)
    fs = get_fs(table_root)
    mdir = fs.join(table_root, data_source, MANIFEST_DIR)
    fs.mkdirs(mdir)
    # The announce happens under the table's commit lease, with a
    # freshness re-check — the same protocol as the DML commit: the plan
    # above was computed from `current`, and a publish/DML landing after
    # that listing would be silently reset-over (or, landing inside a DML
    # commit's own leased window, dodge ITS fingerprint check). Inside
    # the lease the visible view is re-read; any change refuses loudly.
    # New announcements always carry a fresh HIGHEST version, so they
    # cannot hide behind an unchanged visible signature.
    with commit_lease(table_root, data_source, "restore_to"):
        fresh = list_manifests(table_root, data_source)
        fresh_sig = {
            (w.manifest.path, w.windows)
            for w in resolve_visible_windows(fresh, span)
            if not w.manifest.tombstone
        }
        if fresh_sig != cur_sig:
            raise ConcurrentWriteConflict(
                f"{data_source}: the visible timeline changed between "
                "this restore's planning read and its commit — "
                "announcing the restore would silently reset the "
                "intervening write. Nothing was announced; re-run "
                "restore_to against the current state."
            )
        # uuid suffix: two restores stamped in the same microsecond by
        # DIFFERENT processes must not collide on one filename (same
        # convention as compact_manifests)
        fs.put_text(
            fs.join(mdir, f"{SNAPSHOT_PREFIX}restore-{_safe(stamp)}-"
                          f"{_uuid.uuid4().hex[:8]}.json"),
            _json.dumps({"snapshot": entries}, indent=1))
    return planned
