"""Structured Streaming over the managed-table change feed.

``consume_changes`` (sources/changes.py) is a batch poll loop: call,
process, commit. This module wraps the same timeline into Spark's
streaming engine so an incremental consumer is a one-liner that
composes with watermarks, ``foreachBatch`` sinks, and the stateful
operators in streaming/stateful.py — VERDICT r13 item 8, kept thin on
purpose: the batch loop stays the primitive, the stream just drives it.

Two layers:

- ``SegmentAnnounceDataSource`` — a Spark 4 Python streaming data
  source (``SimpleDataSourceStreamReader``) whose rows are segment
  ANNOUNCE EVENTS (one per manifest registration: stamp, version,
  interval, path, tombstone). Offsets are the table's publish stamps —
  the exact tokens ``consume_changes`` checkpoints — so a micro-batch
  fires per committed stamp advance and replays deterministically via
  ``readBetweenOffsets``. The simple (driver-side) reader is the RIGHT
  volume class here: announce events are metadata, one row per
  registration, never row-level data — at 100 TB a table publishes
  thousands of manifests, not billions, and Spark's own docs scope the
  simple reader to exactly this lightweight-input regime.
- ``stream_changes_foreach`` — wires the announce stream into
  ``foreachBatch``: each micro-batch derives its (from, to] stamp pair
  from the batch's rows and hands the caller the ROW-LEVEL feed via
  ``read_changes`` — a distributed, O(changed bytes) scan that never
  crosses the driver. Delivery is at-least-once (foreachBatch replays
  on failure; make ``process`` idempotent, exactly like the batch
  loop's crash-before-commit contract).

Registry integration: pass ``consumer_name`` and the reader's
``commit`` advances the REGISTERED checkpoint
(``consumer_checkpoint_path``) after each batch completes — so
``maintain_table``'s vacuum floor protects a lagging STREAM exactly as
it protects a lagging batch consumer.

The reference is strictly batch (SURVEY.md §2.9); this extends its
announce/overshadow model (DruidStorage.java segment announcement) the
same way streaming/ingest.py extends its publish path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

#: row schema of the announce-event stream (DDL)
ANNOUNCE_SCHEMA = (
    "data_source string, published_at string, version string, "
    "interval_start string, interval_end string, shard int, "
    "tombstone boolean, path string, from_as_of string"
)

_FORMAT_NAME = "segment_announces"


def _parse(stamp: str):
    from druid_hadoop_utils_spark.sources.segments import _parse_as_of

    return _parse_as_of(stamp)


def _commit_if_newer(table_root: str, data_source: str, name: str,
                     stamp: str) -> None:
    """Advance the REGISTERED consumer checkpoint monotonically. Two
    writers share it — the foreachBatch wrapper (in-band, right after
    ``process``) and the reader's ``commit`` callback, which Spark fires
    one trigger LATE (a batch's offset commits at the START of the next
    trigger) — so an unconditional write from the late path could
    REGRESS a checkpoint the in-band path already advanced. Never move
    it backwards."""
    from druid_hadoop_utils_spark.sources.changes import (
        commit_consumed,
        consumer_checkpoint_path,
        read_checkpoint,
    )

    ckpt = consumer_checkpoint_path(table_root, data_source, name)
    cur = read_checkpoint(ckpt)
    if cur is None or _parse(stamp) > _parse(cur):
        commit_consumed(ckpt, stamp)


class BatchLedger:
    """Idempotent-commit ledger that upgrades the change feed's
    at-least-once delivery to EXACTLY-ONCE effects — the missing half of
    the streaming contract (changes_source module docstring: "make
    ``process`` idempotent"; this is the canonical way to).

    A replayed batch arrives with byte-identical (from, to] stamp
    bounds (pinned by ``readBetweenOffsets``), so the stamp pair is a
    deterministic batch identity that — unlike Spark's ``epoch_id`` —
    survives a rebuilt streaming checkpoint. The ledger records one
    metadata object per processed pair; the recipe:

        ledger = BatchLedger(ledger_dir)
        def process(feed, a, b):
            if ledger.committed(a, b) is not None:
                return                      # replay of a finished batch
            out = compute(feed)             # any deterministic fold
            ledger.commit(a, b, out)        # THE single commit point

    ``commit`` is a conditional create-if-absent where the backend
    supports one (POSIX O_EXCL, object-store If-None-Match — the same
    primitive the engine's leases use), so exactly one of N racing
    attempts wins; the loser sees ``False`` and treats the batch as
    done. Exactly-once then holds by construction when the batch's
    durable output IS the committed payload (state snapshots, feature
    counters — see examples/exactly_once_consumer.py), or when the
    output is written to a deterministic overwrite-safe location keyed
    by the stamps (e.g. ``publish_segments(..., version=b)``) BEFORE
    ``commit``: a crash between the two reruns ``compute`` onto its own
    partial output and converges.

    Volume class: one tiny JSON per batch — thousands per table
    lifetime, the same metadata plane as manifests. ``prune(keep)``
    drops all but the newest ``keep`` entries once the Spark checkpoint
    is durable past them. Re-baselining a consumer (forcing a fresh
    GENESIS snapshot: delete the Spark checkpoint dir AND the
    registered consumer checkpoint — a named stream's replay bounds
    clamp to the registry) must start a fresh ledger dir too — the old
    entries describe folds over a state that no longer exists.
    """

    def __init__(self, ledger_dir: str) -> None:
        from druid_hadoop_utils_spark.sources.fs import get_fs

        self._fs = get_fs(ledger_dir)
        self._dir = ledger_dir

    def _entry(self, a: str, b: str) -> str:
        import hashlib

        key = hashlib.sha256(f"{a}->{b}".encode()).hexdigest()[:32]
        return self._fs.join(self._dir, f"batch-{key}.json")

    def committed(self, a: str, b: str):
        """The payload recorded for stamp pair (a, b], or None if the
        batch never committed. ONE metadata read."""
        import json

        try:
            return json.loads(self._fs.read_text(self._entry(a, b)))[
                "payload"]
        except FileNotFoundError:
            return None

    def commit(self, a: str, b: str, payload=None) -> bool:
        """Record (a, b] as processed with ``payload`` (JSON-able).
        Returns True iff THIS call created the entry — False means a
        racing attempt (or an earlier life of this consumer) already
        committed it, and the caller's output must be discarded, not
        applied twice."""
        import json

        from druid_hadoop_utils_spark.sources.changes import _now_stamp

        self._fs.mkdirs(self._dir)
        text = json.dumps({"from": a, "to": b, "payload": payload,
                           "committedAt": _now_stamp()}, indent=2)
        path = self._entry(a, b)
        if self._fs.supports_put_if_absent:
            return self._fs.put_text_if_absent(path, text)
        # fallback for backends without conditional create: exists+put
        # (single-writer semantics only — same residual lease.py notes)
        if self._fs.exists(path):
            return False
        self._fs.put_text(path, text)
        return True

    def entries(self) -> list[dict]:
        """Every committed entry, oldest→newest by commit stamp."""
        import json

        from druid_hadoop_utils_spark.sources.segments import _parse_as_of

        out = []
        for name in self._fs.ls(self._dir):
            if name.startswith("batch-") and name.endswith(".json"):
                out.append(json.loads(self._fs.read_text(
                    self._fs.join(self._dir, name))))
        out.sort(key=lambda e: _parse_as_of(e["committedAt"]))
        return out

    def latest(self):
        """The newest committed entry (by commit stamp), or None."""
        es = self.entries()
        return es[-1] if es else None

    def prune(self, keep: int = 64) -> int:
        """Drop all but the newest ``keep`` entries; returns how many
        were removed. Safe once the Spark checkpoint is durably past
        them (a replay can only ever re-deliver the LAST unfinished
        batch, never ones the checkpoint already covers)."""
        es = self.entries()
        drop = es[:-keep] if keep > 0 else es
        for e in drop:
            self._fs.delete_file(self._entry(e["from"], e["to"]))
        return len(drop)


class SegmentAnnounceStreamReader(SimpleDataSourceStreamReader):
    """Driver-side reader: offsets are ``{"asOf": <publish stamp>}``.

    ``read(start)`` returns every manifest registration with
    ``start < published_at <= latest`` (strict lower bound — a stamp
    exactly at the checkpoint is never redelivered), stamped with the
    batch's ``from_as_of`` so downstream code can reconstruct the exact
    (A, B] view pair without private state. Replay after a crash goes
    through ``readBetweenOffsets`` with the SAME bounds — byte-identical
    batches, which is what makes the foreachBatch layer safely
    at-least-once."""

    def __init__(self, options) -> None:
        self.table_root = options.get("tableroot")
        self.data_source = options.get("datasource")
        if not self.table_root or not self.data_source:
            raise ValueError(
                "segment_announces needs .option('tableRoot', ...) and "
                ".option('dataSource', ...)")
        self.consumer_name = options.get("consumername")

    # -- offset plumbing -------------------------------------------------
    def initialOffset(self) -> dict:
        from druid_hadoop_utils_spark.sources.changes import GENESIS

        return {"asOf": GENESIS}

    def _events(self, lo: str, hi: str) -> Iterator[Tuple]:
        # returns a LIST-backed iterator: Spark's prefetch cache
        # copy.copy()s the iterator it gets back, which a generator
        # cannot survive (TypeError: cannot pickle 'generator')
        from druid_hadoop_utils_spark.sources.changes import GENESIS
        from druid_hadoop_utils_spark.sources.segments import list_manifests

        t_hi = _parse(hi)
        t_lo = None if lo == GENESIS else _parse(lo)
        picked = []
        for m in list_manifests(self.table_root, self.data_source):
            if m.published_at is None:
                continue
            t = _parse(m.published_at)
            if (t_lo is None or t > t_lo) and t <= t_hi:
                picked.append((t, m))
        picked.sort(key=lambda tm: (tm[0], tm[1].version, tm[1].shard_num))
        return iter([
            (self.data_source, m.published_at, m.version,
             m.interval.start.isoformat(), m.interval.end.isoformat(),
             m.shard_num, bool(m.tombstone), m.path, lo)
            for _t, m in picked
        ])

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        from druid_hadoop_utils_spark.sources.changes import (
            GENESIS,
            latest_stamp,
        )

        lo = start["asOf"]
        try:
            latest = latest_stamp(self.table_root, self.data_source)
        except FileNotFoundError:
            return iter(()), start  # table not born yet: stay at start
        if latest is None or (lo != GENESIS
                              and _parse(latest) <= _parse(lo)):
            return iter(()), start  # caught up: empty batch, no advance
        return self._events(lo, latest), {"asOf": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return self._events(start["asOf"], end["asOf"])

    def commit(self, end: dict) -> None:
        # reuse the consumer REGISTRY: a named stream's progress floors
        # maintain_table's vacuum exactly like a batch consumer's.
        # NOTE Spark fires this one trigger LATE (batch N commits when
        # batch N+1 starts), hence the monotonic guard — and an
        # availableNow one-shot may stop before it fires at all, which
        # is why stream_changes_foreach also commits in-band.
        from druid_hadoop_utils_spark.sources.changes import GENESIS

        if self.consumer_name and end.get("asOf") not in (None, GENESIS):
            _commit_if_newer(self.table_root, self.data_source,
                             self.consumer_name, end["asOf"])


class SegmentAnnounceDataSource(DataSource):
    """``spark.readStream.format("segment_announces")`` — registered via
    :func:`register_announce_source`."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> str:
        return ANNOUNCE_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
        return SegmentAnnounceStreamReader(self.options)


def register_announce_source(spark: SparkSession) -> None:
    """Idempotently register the ``segment_announces`` streaming format
    on this session."""
    spark.dataSource.register(SegmentAnnounceDataSource)


def stream_announcements(spark: SparkSession, table_root: str,
                         data_source: str, *,
                         consumer_name: str | None = None) -> DataFrame:
    """The announce-event stream as a streaming DataFrame — one row per
    manifest registration, micro-batched per publish-stamp advance.
    With ``consumer_name`` the stream also advances that REGISTERED
    consumer checkpoint on every completed batch (vacuum-floor
    protected)."""
    register_announce_source(spark)
    r = (spark.readStream.format(_FORMAT_NAME)
         .option("tableRoot", table_root)
         .option("dataSource", data_source))
    if consumer_name:
        r = r.option("consumerName", consumer_name)
    return r.load()


def stream_changes_foreach(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    process: Callable[[DataFrame, str, str], None],
    *,
    checkpoint_dir: str,
    consumer_name: str | None = None,
    mode: str = "logical",
    columns: list[str] | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
):
    """The incremental consumer as ONE streaming query:

        q = stream_changes_foreach(spark, root, "docs", my_fn,
                                   checkpoint_dir=ckpt,
                                   consumer_name="feature_builder")

    Each micro-batch calls ``process(feed, from_as_of, to_as_of)`` where
    ``feed`` is the ROW-LEVEL change feed between the two stamps —
    ``read_changes``' distributed O(changed bytes) plan, identical to
    what the batch loop's ``consume_changes`` would deliver for the same
    pair (only announce METADATA ever crosses the driver). First batch
    delivers the full snapshot as inserts (GENESIS), exactly like the
    batch loop's first run. At-least-once: a batch that fails before
    Spark checkpoints it replays — make ``process`` idempotent
    (``BatchLedger`` is the supported recipe). With ``consumer_name``,
    replay bounds CLAMP to the registered checkpoint (the consumer's
    durable progress, advanced only after ``process`` succeeds): a
    batch the registry already covers is skipped whole, and a widened
    replay — offset rollback plus new publishes before restart — is
    narrowed to the unprocessed (checkpoint, to] suffix, so the stream
    never wedges on a FROM view the vacuum legitimately reclaimed and
    a ledger keyed on the delivered pairs never double-folds. A
    below-horizon error surviving the clamp means the consumer
    genuinely fell too far behind and propagates. Re-baselining a
    NAMED stream therefore requires removing the registered checkpoint
    too, not just the Spark checkpoint dir. ``columns`` projects the
    feed before netting (``read_changes`` semantics: only those
    columns' bytes are scanned; changes outside the projection net to
    empty batch feeds). Returns the started StreamingQuery.

    ``available_now`` note: Spark's Python micro-batch bridge doesn't
    implement SupportsTriggerAvailableNow and logs a "falling back to
    single batch execution" warning — benign here: the fallback runs
    ONE batch covering everything outstanding (exactly a batch-loop
    ``consume_changes`` cycle) and stops; the next start resumes from
    the checkpoint."""
    from druid_hadoop_utils_spark.sources.changes import read_changes
    from druid_hadoop_utils_spark.sources.segments import _parse_as_of

    ann = stream_announcements(spark, table_root, data_source,
                               consumer_name=consumer_name)

    def _batch(batch_df: DataFrame, _epoch: int) -> None:
        # announce rows only — metadata-sized by construction
        from druid_hadoop_utils_spark.sources.changes import (
            GENESIS,
            consumer_checkpoint_path,
            read_checkpoint,
        )

        rows = batch_df.select("from_as_of", "published_at").collect()
        if not rows:
            return
        froms = {r["from_as_of"] for r in rows}

        a = (GENESIS if GENESIS in froms
             else min(froms, key=_parse_as_of))
        b = max((r["published_at"] for r in rows), key=_parse_as_of)
        if consumer_name:
            # The REGISTERED checkpoint is the consumer's durable
            # progress; Spark's offset checkpoint is only the trigger.
            # After a crash in the in-band-commit/offset-checkpoint
            # window (ADVICE r14) — or an offset rollback plus NEW
            # publishes landing before restart — the replayed batch's
            # bounds cover work the registry already proves complete
            # (process-then-commit ordering). Clamp to the unprocessed
            # suffix: skip entirely when cur >= b; start from cur when
            # a < cur < b. This (a) closes the replay wedge — view a
            # may be below the vacuum horizon, but view cur is floor-
            # protected by this very registration; (b) keeps the
            # (from, to] pairs handed to `process` aligned with what
            # was actually processed, so a BatchLedger keyed on them
            # can never double-fold a committed delta under widened
            # replay bounds. A below-horizon error AFTER this clamp is
            # a genuinely-fell-too-far-behind condition and propagates.
            # Consequence for re-baselining: a NAMED stream restarted
            # with a fresh Spark checkpoint resumes from its registry,
            # not GENESIS — re-baseline by removing the registered
            # checkpoint (and starting a fresh ledger) as well.
            cur = read_checkpoint(consumer_checkpoint_path(
                table_root, data_source, consumer_name))
            if cur is not None:
                if _parse_as_of(cur) >= _parse_as_of(b):
                    return
                if a == GENESIS or _parse_as_of(cur) > _parse_as_of(a):
                    a = cur
        feed = read_changes(spark, table_root, data_source, a, b,
                            mode=mode, columns=columns)
        process(feed, a, b)
        # in-band registry advance, AFTER process succeeds — the batch
        # loop's process-then-commit ordering. The reader's own commit
        # callback fires a trigger late (or never, for an availableNow
        # one-shot); both paths are monotonic so they compose.
        if consumer_name:
            _commit_if_newer(table_root, data_source, consumer_name, b)

    w = (ann.writeStream.foreachBatch(_batch)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()
