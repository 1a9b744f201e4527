"""Failures CSV source + the engine-level query registry contract."""

from __future__ import annotations

from pathlib import Path

from bike_data_flow_spark.operators.enhance import enhance
from bike_data_flow_spark.operators.parse import read_raw_partition
from bike_data_flow_spark.operators.views import latest_per_station
from bike_data_flow_spark.queries import load_all
from bike_data_flow_spark.sources.failures import failures_per_station, read_failures

CSV = """report_id,bike_number,station_name,report_date,failure_type,description
1,64731,Station 1,2025-05-01,flat_tire,opona
2,64732,Station 1,2025-05-01,brakes,hamulce
3,64733,Station 2,2025-05-02,chain,lancuch
4,64734,Nowhere,2025-05-02,chain,lancuch
"""


def test_failures_csv_and_join(spark, landing, tmp_path):
    p = tmp_path / "failures"
    p.mkdir()
    (p / "wrm_failures_2025-05-02.csv").write_text(CSV)
    failures = read_failures(spark, str(p))
    assert failures.count() == 4
    enhanced = enhance(read_raw_partition(spark, str(landing), "2025-05-01"), "2025-05-01")
    latest = latest_per_station(enhanced)
    joined = failures_per_station(failures, latest)
    rows = {(r["station_name"], r["failure_type"]): r for r in joined.collect()}
    assert rows[("Station 1", "flat_tire")]["station_id"] == "001"
    assert rows[("Station 1", "flat_tire")]["n_reports"] == 1
    assert rows[("Nowhere", "chain")]["station_id"] is None  # left join keeps it


def test_registry_contract():
    reg = load_all()
    assert len(reg) >= 25
    for name, q in reg.items():
        assert q.name == name and callable(q.fn)
    # oracle coverage: EVERY registered query, including k-means
    # (fixed-iteration Lloyd's unrolled into CTEs since round 4)
    no_oracle = {name for name, q in reg.items() if not q.oracle}
    assert no_oracle == set()


def test_entry_module_contract(spark):
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    df = E.entry(spark)
    assert df.count() > 0
