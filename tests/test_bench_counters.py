"""bench.py's per-query JVM counters (GC deltas, post-reset peak heap,
spill deltas) must read real values through the Py4J management APIs —
the attribution story in BENCH_COMPARE.md depends on these not silently
returning sentinels."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import _gc_totals, _peak_heap_mb, _reset_heap_peaks, _spill_mb  # noqa: E402


def test_gc_totals_monotone_nonnegative(spark):
    ms0, n0 = _gc_totals(spark)
    assert ms0 >= 0 and n0 >= 0
    spark.sparkContext._jvm.System.gc()
    ms1, n1 = _gc_totals(spark)
    assert ms1 >= ms0 and n1 >= n0
    # an explicit System.gc() must register as at least one collection
    assert n1 > n0


def test_peak_heap_resets_and_reads(spark):
    _reset_heap_peaks(spark)
    # allocate something JVM-side so the peak is demonstrably live
    spark.range(2_000_00).selectExpr("sum(id)").collect()
    peak = _peak_heap_mb(spark)
    assert peak > 0.0
    _reset_heap_peaks(spark)
    # post-reset the peak re-anchors to current usage: still positive
    # (the heap is never empty), and the reset visibly took effect
    # because another reset+read stays self-consistent
    assert _peak_heap_mb(spark) > 0.0


def test_contract_line_fits_driver_capture_window():
    """The driver keeps only the LAST 2000 bytes of bench stdout; the
    final JSON line must fit with headroom or the round's official perf
    number silently becomes parsed:null (the r8/r9 regression). Budget
    the line at worst-case timing widths for the CURRENT bench set so
    adding queries past the window fails loudly here first."""
    import json

    from bike_data_flow_spark.queries import load_all

    names = [q.name for q in load_all().values() if q.bench]
    assert names, "bench set is empty"
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 99999.999,
            "unit": "sec",
            "value_engine": 99999.999,
            "value_materializing": 99999.999,
            "queries": {n: 99999.999 for n in names},
            "sf": 0.1,
        }
    )
    assert len(line.encode()) < 1900, (
        f"bench contract line is {len(line.encode())} bytes for "
        f"{len(names)} queries — trim the bench set or shorten names "
        "(driver capture window = 2000 bytes)"
    )


def test_spill_reader_returns_real_total(spark):
    # the AppStatusStore path must resolve (not the -1.0 sentinel): a
    # moved internal API would silently break attribution
    spark.range(10).selectExpr("sum(id)").collect()
    assert _spill_mb(spark) >= 0.0


def test_host_state_fields_present_and_sane():
    """The host-noise attribution snapshot (VERDICT r10 #3) must read
    real values on this platform — buff/cache fill, load average, and
    a timed disk-read probe — so a 'flat counters, inflated wall'
    anomaly is attributable from BENCH_COUNTERS.json alone."""
    from bench import _host_state

    state = _host_state("/root/testdata/sf0.001")
    assert state["buff_cache_gb"] >= 0.0
    assert state["mem_available_gb"] > 0.0
    assert state["loadavg_1m"] >= 0.0
    assert 0.0 < state["read_probe_mb"] <= 64.0
    assert state["read_probe_mb_s"] > 0.0


def test_host_state_survives_bad_dir():
    """Diagnostics never break the contract: a missing sf dir just
    drops the probe fields (bench keeps timing and printing)."""
    from bench import _host_state

    state = _host_state("/nonexistent/sf_dir")
    assert "read_probe_mb" not in state
    assert "loadavg_1m" in state  # the host fields are independent


def test_materializing_split_is_consistent_with_compare_exclusions():
    """bench.py's value_materializing subtotal and BENCH_COMPARE.md's
    'reported separately' table must be defined by the SAME classifier
    (queries.is_materializing) — a drift would let an I/O-bound query
    leak into one report's engine total but not the other's."""
    from bike_data_flow_spark.queries import is_materializing, load_all

    reg = load_all()
    flagged = {n for n in reg if is_materializing(n)}
    # every snapshot-writer and every streaming-boot query is flagged
    assert "incremental_dedup_pairs" in flagged
    assert "foreachbatch_incremental_dedup" in flagged
    assert "streamed_windowed_counts" in flagged
    assert "snapshot_table_roundtrip" in flagged
    # batch compute paths are not
    assert "curation_v2" not in flagged
    assert "pricing_summary" not in flagged
    assert "minhash_lsh_pairs" not in flagged
