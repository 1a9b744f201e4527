"""`station_feed` — a Python Data Source (Spark 4 connector API) over
the dt=-partitioned raw landing zone.

The reference scans its landing bucket with hand-rolled listing +
per-file reads (storage/wrm_data/raw listing, S4/S5 in SURVEY §2.1;
most-recent-file logic raw_all.py:96-118). Spark's idiomatic answer for
"a feed Spark has no built-in source for" is a pluggable DataSource:
this module registers one that makes the landing zone queryable as
`spark.read.format("station_feed")` AND as a micro-batch stream
(`spark.readStream.format("station_feed")`), with the listing,
partitioning, and incremental-offset logic inside the connector where
the engine can parallelize it:

- one InputPartition per landed file → Spark schedules file reads
  across executors; a 100k-file landing zone is a 100k-task scan, not
  a driver loop.
- `pushFilters` handles dt= predicates (=, <, <=, >, >=, IN) by
  pruning the file listing BEFORE any partition is created — the
  Python-connector spelling of partition pruning, so `WHERE dt =
  '2025-05-01'` reads one day's files no matter how many days landed.
- the stream reader's offset is the lexicographically-last landed
  filename (filenames embed the snapshot timestamp, so name order ==
  time order — the property the reference's most-recent-file
  resolution relies on); each micro-batch reads only files beyond the
  offset, giving exactly-once file delivery with a replayable range
  (`readBetweenOffsets`).

Rows are the raw wire lines (`value`) + lineage (`src_file`, `dt`) —
the same shape `operators/parse.parse_raw_lines` consumes.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "value string, src_file string, dt string"


def _list_files(root: str) -> list[tuple[str, str]]:
    """Sorted (dt, absolute path) for every landed snapshot file."""
    out: list[tuple[str, str]] = []
    for dt_dir in sorted(Path(root).glob("dt=*")):
        dt = dt_dir.name.split("=", 1)[1]
        for f in sorted(dt_dir.glob("*.txt")):
            out.append((dt, str(f)))
    return out


def _read_file(dt: str, path: str):
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            yield (line.rstrip("\n"), path, dt)


class _FilePartition(InputPartition):
    def __init__(self, dt: str, path: str):
        self.dt = dt
        self.path = path


class StationFeedReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("station_feed requires option 'path'")
        self._dt_pred = lambda dt: True

    def pushFilters(self, filters: list[Filter]):
        """Accept dt= comparisons (prunes the listing); everything else
        is returned for Spark to evaluate post-scan."""
        preds = []
        for f in filters:
            col = f.attribute[-1] if getattr(f, "attribute", None) else None
            if col != "dt":
                yield f
                continue
            if isinstance(f, EqualTo):
                preds.append(lambda dt, v=f.value: dt == v)
            elif isinstance(f, In):
                # pyspark's In dataclass carries the tuple in `.value`
                # (singular) — verified on 4.1.2; `.values` does not exist
                preds.append(lambda dt, v=set(f.value): dt in v)
            elif isinstance(f, GreaterThan):
                preds.append(lambda dt, v=f.value: dt > v)
            elif isinstance(f, GreaterThanOrEqual):
                preds.append(lambda dt, v=f.value: dt >= v)
            elif isinstance(f, LessThan):
                preds.append(lambda dt, v=f.value: dt < v)
            elif isinstance(f, LessThanOrEqual):
                preds.append(lambda dt, v=f.value: dt <= v)
            else:
                yield f
                continue
        self._dt_pred = lambda dt, ps=preds: all(p(dt) for p in ps)

    def partitions(self):
        return [
            _FilePartition(dt, path)
            for dt, path in _list_files(self.root)
            if self._dt_pred(dt)
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.dt, partition.path)


class StationFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset = last consumed filename (name order
    == snapshot-time order). Stateless between calls — the offset alone
    reconstructs progress, so checkpoint recovery replays exactly the
    unconsumed suffix."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("station_feed requires option 'path'")

    def initialOffset(self):
        return {"last": ""}

    def read(self, start):
        files = [
            (dt, p)
            for dt, p in _list_files(self.root)
            if os.path.basename(p) > start["last"]
        ]
        if not files:
            return iter([]), start
        end = {"last": os.path.basename(files[-1][1])}
        rows = [row for dt, p in files for row in _read_file(dt, p)]
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        return (
            row
            for dt, p in _list_files(self.root)
            if start["last"] < os.path.basename(p) <= end["last"]
            for row in _read_file(dt, p)
        )


class StationFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "station_feed"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return StationFeedReader(self.options)

    def simpleStreamReader(self, schema):
        return StationFeedStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (runtime conf); without it
    # Spark refuses a reader that implements pushFilters.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(StationFeedDataSource)
