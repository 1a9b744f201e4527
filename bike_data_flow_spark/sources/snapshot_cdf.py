"""Streaming change-data-feed source over the snapshot table format.

`operators/snapshots.py` gives batch tables snapshot isolation, time
travel, and a batch CDF (`snapshot_changes`). This source closes the
loop for INCREMENTAL pipelines: a Structured Streaming query can
`readStream.format("snapshot_cdf")` a snapshot table and receive each
committed APPEND as a micro-batch of inserted rows, tagged with the
commit version — the Delta-CDF-stream pattern (reference semantics:
downstream assets recompute when upstream tables gain partitions;
this is the push spelling of that dependency).

Offsets are commit versions: offset N means "versions ≤ N consumed".
The offset alone reconstructs progress, so checkpoint recovery
replays exactly the unconsumed versions (`readBetweenOffsets`).

Append-only contract: an overwrite commit inside the unconsumed range
raises instead of silently emitting wrong deltas (the same stance
Delta's streaming source takes without ignoreChanges — a rewritten
table needs a reprocessing decision, not a guess). The supported
restart path is the ``startingVersion`` option (Delta's spelling): a
NEW stream beginning AT the overwrite emits it as the initial load, or
beginning past it emits only later appends. Retention must exceed
consumer downtime: versions expired before being consumed raise on
the missing manifest rather than skipping data.

Rows are read executor-side with pyarrow (the manifest names one new
data dir per append — no Spark scan inside the reader), projected to
the schema recorded on the manifest at stream start; appends written
before a column existed surface NULL for it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..operators import snapshots as S

CHANGE_COLS = ("_commit_version", "_change_type")


def _manifest(table_dir: str, version: int) -> dict:
    return S._read_manifest(table_dir, version)


def _append_dir(table_dir: str, version: int, genesis: bool = False) -> str:
    """The version's OWN data dir. ``genesis`` marks the stream's first
    emitted version, where an overwrite commit is legal — it reads as
    the initial load (its manifest lists exactly one dir), which is how
    a stream starts over after a table rewrite (startingVersion)."""
    m = _manifest(table_dir, version)
    if m["mode"] != "append" and version > 1 and not genesis:
        raise ValueError(
            f"snapshot_cdf is append-only: version {version} of {table_dir} "
            "is an overwrite commit — reprocess the table or start a new "
            f"stream with startingVersion={version} (initial load) or "
            f"{version + 1} (changes after the rewrite)"
        )
    # an append manifest lists prior dirs + its OWN dir last
    return os.path.join(table_dir, m["dirs"][-1])


@dataclass
class _VersionPartition(InputPartition):
    version: int
    data_dir: str


class SnapshotCdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("snapshot_cdf requires option 'path'")
        self.schema = schema
        self.fields = [f.name for f in schema.fields if f.name not in CHANGE_COLS]
        # startingVersion = the first version the stream EMITS (the
        # supported way to begin past an overwrite or an initial-load
        # commit — without it the append-only guard would make such a
        # table permanently unstreamable, ADVICE r5). Default 1 keeps
        # the from-genesis behavior.
        raw = options.get("startingversion", options.get("startingVersion", 1))
        try:
            self.starting_version = int(raw)
        except (TypeError, ValueError):
            raise ValueError(
                f"snapshot_cdf option startingVersion must be an int, got {raw!r}"
            ) from None
        if self.starting_version < 1:
            raise ValueError(
                "snapshot_cdf option startingVersion must be >= 1, got "
                f"{self.starting_version}"
            )

    def initialOffset(self):
        # offset N = "versions <= N consumed": starting AT version V
        # means versions < V are pre-consumed
        return {"version": self.starting_version - 1}

    def latestOffset(self):
        cur = S.current_version(self.table_dir)
        return {"version": cur or 0}

    def partitions(self, start, end):
        # compaction commits (snapshot_compact) are data-preserving
        # rewrites: there are no change events to emit, so they are
        # SKIPPED rather than tripping the overwrite guard — appends
        # keep streaming across an OPTIMIZE. A compaction at the
        # stream's genesis still emits (it IS the initial load there).
        out = []
        for v in range(start["version"] + 1, end["version"] + 1):
            genesis = v == self.starting_version
            if not genesis and S.is_compaction(self.table_dir, v):
                continue
            out.append(
                _VersionPartition(
                    v, _append_dir(self.table_dir, v, genesis=genesis)
                )
            )
        return out

    def read(self, partition: _VersionPartition):
        table = pq.read_table(partition.data_dir)
        cols = {}
        n = table.num_rows
        for name in self.fields:
            if name in table.column_names:
                cols[name] = table.column(name).to_pylist()
            else:  # pre-evolution append: column didn't exist yet
                cols[name] = [None] * n
        for i in range(n):
            yield tuple(cols[name][i] for name in self.fields) + (
                partition.version,
                "insert",
            )

    def commit(self, end):
        pass


class SnapshotCdfDataSource(DataSource):
    @classmethod
    def name(cls):
        return "snapshot_cdf"

    def schema(self):
        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("snapshot_cdf requires option 'path'")
        cur = S.current_version(table_dir)
        if cur is None:
            raise FileNotFoundError(f"no committed snapshot under {table_dir}")
        base = StructType.fromJson(_manifest(table_dir, cur)["schema"])
        out = StructType(base.fields)
        out = out.add("_commit_version", "long").add("_change_type", "string")
        return out

    def streamReader(self, schema):
        return SnapshotCdfStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SnapshotCdfDataSource)
