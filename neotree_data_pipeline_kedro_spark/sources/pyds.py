"""Custom Python DataSource connector (Spark 4 DataSource API).

The reference ingests from an external system (Postgres via SQLAlchemy,
`conf/common/sql_functions.py` read/insert helpers) — the Spark-idiomatic
equivalent of "talk to an arbitrary external feed" is a registered
DataSource: schema declaration, PARTITION PLANNING (parallel reads with
no driver bottleneck), FILTER PUSHDOWN (predicates applied inside the
source so pruned partitions are never read), and an atomic WRITER
(temp-dir + commit rename, the S3/S5 row-insert sink contract).

`SessionFeedDataSource` is a deterministic synthetic session feed — the
connector scaffolding is the product; the generator stands in for the
network client. At 100 TB the properties that matter are exactly the
ones tested: reads parallelize across `partitions()` (one remote cursor
per partition), an `EqualTo(scriptid)` predicate prunes whole partitions
source-side, and writes commit atomically per job, not per task.

Usage::

    spark.dataSource.register(SessionFeedDataSource)
    df = (spark.read.format("session_feed")
          .option("n", 10_000).option("partitions", 8).load())
    df.write.format("session_feed").mode("append")
      .option("path", "/tmp/out").save()
"""
from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCRIPTS = ("adm", "dis", "vit", "lab")


def _feed_schema() -> StructType:
    return StructType(
        [
            StructField("uid", StringType()),
            StructField("scriptid", StringType()),
            StructField("facility", IntegerType()),
            StructField("seq", LongType()),
            StructField("entries", StringType()),
        ]
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int
    scriptid: str | None


def _row(i: int) -> tuple:
    sid = _SCRIPTS[i % len(_SCRIPTS)]
    uid = f"{(i * 2654435761) % 104729:05d}-{i % 7}"
    entries = json.dumps(
        {"key": f"k{i % 13}", "value": (i * 37) % 1000}, sort_keys=True
    )
    return (uid, sid, i % 23, i, entries)


class _FeedReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 4))
        self.scriptid: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            # one exact-match predicate the "remote system" can serve
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("scriptid",)
                and isinstance(f.value, str)
            ):
                self.scriptid = f.value
            else:
                yield f

    def partitions(self):
        # With a pushed scriptid predicate, plan partitions over the
        # matching residue class only — the source generates (reads)
        # exactly the qualifying rows, a 4x I/O cut the post-scan filter
        # could never give. An unknown scriptid plans zero partitions.
        if self.scriptid is not None:
            if self.scriptid not in _SCRIPTS:
                # an empty partition LIST makes Spark fall back to
                # read(None); plan one empty RANGE instead
                return [_Range(0, 0, None)]
            idx = _SCRIPTS.index(self.scriptid)
            m = max(0, (self.n - idx + len(_SCRIPTS) - 1) // len(_SCRIPTS))
        else:
            m = self.n
        step = max(1, (m + self.num_parts - 1) // self.num_parts)
        return [
            _Range(s, min(m, s + step), self.scriptid)
            for s in range(0, m, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        if partition.scriptid is not None:
            idx = _SCRIPTS.index(partition.scriptid)
            for j in range(partition.start, partition.end):
                yield _row(idx + len(_SCRIPTS) * j)
        else:
            for i in range(partition.start, partition.end):
                yield _row(i)


@dataclass
class _Committed(WriterCommitMessage):
    tmp_file: str
    rows: int


class _FeedWriter(DataSourceWriter):
    """JSON-lines sink with job-level atomic commit: tasks write to a
    hidden temp dir; commit() renames every task file into place and
    stamps _SUCCESS; abort() removes the temp dir — a failed job leaves
    nothing visible (the reference's transactional INSERT batches,
    sql_functions.py:334, re-expressed as a two-phase commit)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("session_feed writer requires option 'path'")
        self.tmp = os.path.join(self.path, "_temporary")

    def write(self, iterator) -> _Committed:
        os.makedirs(self.tmp, exist_ok=True)
        name = os.path.join(self.tmp, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _Committed(tmp_file=name, rows=n)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None or m.rows == 0:
                continue
            dest = os.path.join(self.path, os.path.basename(m.tmp_file))
            os.replace(m.tmp_file, dest)
        shutil.rmtree(self.tmp, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        shutil.rmtree(self.tmp, ignore_errors=True)


class SessionFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "session_feed"

    def schema(self) -> StructType:
        return _feed_schema()

    def reader(self, schema: StructType) -> _FeedReader:
        return _FeedReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> _FeedWriter:
        return _FeedWriter(self.options)


class _FeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic feed: the offset
    is the next row index; each read() drains at most ``rows_per_batch``
    new rows and returns the advanced offset — the reference's
    cron-poll + NOT-EXISTS ingestion loop (automation.py cadence),
    re-expressed as a proper streaming source with exactly-once offsets
    (Spark persists the offset in the checkpoint; replays call
    readBetweenOffsets over the same range and regenerate identical
    rows, so recovery is deterministic)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(self.n, lo + self.rows_per_batch)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])


class SessionFeedStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "session_feed_stream"

    def schema(self) -> StructType:
        return _feed_schema()

    def simpleStreamReader(self, schema: StructType) -> _FeedStreamReader:
        return _FeedStreamReader(self.options)
