"""Events-loader encoding adaptivity (tables.normalize_events).

The driver's events.parquet has shipped TIMESTAMP(NANOS) (rounds 1-2)
and timestamp[us] (round 3+). The loader must produce the SAME
`ts`/`ts_ns` contract from either file — this test writes both
encodings of identical instants and diffs the normalized output, so
the next encoding flip fails here instead of in the external gate.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bike_data_flow_spark.tables import _read_events_raw, normalize_events

_INSTANTS_US = [1704067798778549, 1704068166738090, 1704068217102229]


def _write_events(path: Path, unit: str) -> None:
    mult = 1000 if unit == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([t * mult for t in _INSTANTS_US], pa.timestamp(unit)),
            "user_id": pa.array([13, 12, 12], pa.int64()),
            "event_type": pa.array(["error", "signup", "purchase"]),
            "value": pa.array([185.22, 106.03, 9.64], pa.float64()),
            "props": pa.array(['{"k": 87}', '{"k": 0}', '{"k": 12}']),
        }
    )
    pq.write_table(table, str(path / "events.parquet"))


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_normalized_contract_per_encoding(spark, tmp_path: Path, unit: str):
    d = tmp_path / unit
    d.mkdir()
    _write_events(d, unit)
    out = normalize_events(_read_events_raw(spark, str(d))).orderBy("event_id")
    assert [f.dataType.simpleString() for f in out.schema.fields[1:3]] == [
        "timestamp",
        "bigint",
    ]
    rows = out.collect()
    assert [r["ts_ns"] for r in rows] == [t * 1000 for t in _INSTANTS_US]
    assert [int(r["ts"].timestamp() * 1_000_000) for r in rows] == pytest.approx(
        _INSTANTS_US
    )


def test_both_encodings_normalize_identically(spark, tmp_path: Path):
    a, b = tmp_path / "us", tmp_path / "ns"
    a.mkdir(), b.mkdir()
    _write_events(a, "us")
    _write_events(b, "ns")
    us = normalize_events(_read_events_raw(spark, str(a))).orderBy("event_id").collect()
    ns = normalize_events(_read_events_raw(spark, str(b))).orderBy("event_id").collect()
    assert us == ns
