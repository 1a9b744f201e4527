"""End-to-end bike-domain pipeline in the correctness gate.

The reference's core path — raw landing-zone text (wire format,
FIXTURES.md §1) → parse (processed_all.py) → enhance
(enhanced_all.py) → wrm_stations_latest view
(create_enhanced_views.py:84-94) — exercised over a DETERMINISTIC
generated landing fixture and oracle-checked against DuckDB parsing
the SAME raw files in SQL (read_text + string_split replicate the
header surgery / composite split / typed casts / drop rules).

The fixture is written at import time so the files exist whichever
side (Spark or the DuckDB oracle) the gate happens to run first; the
content is byte-deterministic, so re-writes are idempotent. Epoch
values are whole seconds — double→timestamp conversion is then exact
in both engines (fractional epochs round differently at the µs edge).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

# Per-user root: on a shared machine a fixed /tmp path owned by another
# user would make os.makedirs raise at import and take the whole query
# registry down with it. The oracle SQL embeds this same constant, so
# both engines always read the same files.
FIXTURE_ROOT = f"/tmp/spark_graft_wrm_fixture_{os.getuid()}/raw"

_HEADER = (
    "#id,1705147845|3600|-3600,name,lat,lon,bikes,spaces,installed,"
    "locked,temporary,total_docks,givesbonus_acceptspedelecs_fbbattlevel,pedelecs"
)

# dt -> filename-timestamp -> rows. Exercises: multi-snapshot
# latest-per-station, a station that disappears after day 1 (003), a
# bike row (fb/BIKE), an unknown-type row, malformed composite, short
# row, unparseable numeric, empty bool flag, mixed-case booleans.
_FIXTURE: dict[str, dict[str, list[str]]] = {
    "2025-05-01": {
        "2025-05-01_10-00-00": [
            "001,1705147800|3600|-3600,Station One,51.1089,17.0377,5,10,true,false,false,15,false,2",
            "002,1705147801|3600|-3600,Station Two,51.1097,17.0314,0,12,true,false,false,12,true,3",
            "003,1705147802|3600|-3600,Station Three,51.2,17.2,3,3,false,true,false,6,true,1",
            "fb10001,1705147803|3600|-3600,BIKE 64731,51.1105,17.0251,1,0,true,false,false,1,true,0",
        ],
        "2025-05-01_10-05-00": [
            "001,1705148100|3600|-3600,Station One,51.1089,17.0377,4,11,true,false,false,15,false,2",
            "004,invalid_ts,Station Four,51.3,17.3,1,2,true,false,false,3,false,0",
            "005,corrupted_row",
            "006,1705148101|3600|-3600,Station Six,not_a_lat,17.0,1,2,true,false,false,3,false,0",
            "007,1705148102|3600|-3600,Station Seven,51.12,17.04,2,3,True,False,false,5,,1",
        ],
    },
    "2025-05-02": {
        "2025-05-02_09-00-00": [
            "001,1705234200|3600|-3600,Station One,51.1089,17.0377,7,8,true,false,false,15,false,2",
            "002,1705234201|3600|-3600,Station Two,51.1097,17.0314,2,10,false,false,true,12,true,3",
            "xx9,1705234202|3600|-3600,Weird Row,51.0,17.0,1,1,true,false,false,2,false,0",
        ],
    },
}


def ensure_fixture() -> str:
    """Write the landing fixture (idempotent, byte-deterministic).
    Write-then-rename per file, so a concurrent reader (the DuckDB
    oracle in another process) never sees a partial payload. Files from
    an OLDER fixture definition are pruned — the oracle's glob would
    read them while the Spark side (driven by _FIXTURE) would not,
    guaranteeing a gate mismatch."""
    import glob

    expected = set()
    for dt, files in _FIXTURE.items():
        d = f"{FIXTURE_ROOT}/dt={dt}"
        os.makedirs(d, exist_ok=True)
        for ts, rows in files.items():
            path = f"{d}/wrm_stations_{ts}.txt"
            expected.add(path)
            content = "\n".join([_HEADER] + rows) + "\n"
            if not (os.path.exists(path) and open(path, encoding="utf-8").read() == content):
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(content)
                os.replace(tmp, path)
    for stale in glob.glob(f"{FIXTURE_ROOT}/dt=*/*.txt"):
        if stale not in expected:
            os.remove(stale)
    return FIXTURE_ROOT


# Import-time best effort so the files exist whichever side of the gate
# runs first; guarded so an unwritable tmp can only ever fail THIS
# query (the fn retries via ensure_fixture), never the registry import.
try:
    ensure_fixture()
except OSError:
    pass


_WRM_ORACLE = f"""
WITH lines AS (
  SELECT unnest(string_split(content, chr(10))) AS value, filename
  FROM read_text('{FIXTURE_ROOT}/dt=*/wrm_stations_*.txt')
),
split AS (
  SELECT string_split(value, ',') AS p,
         string_split(string_split(value, ',')[2], '|') AS c,
         filename
  FROM lines
  WHERE NOT starts_with(value, '#id') AND length(trim(value)) > 0
),
typed AS (
  SELECT p[1] AS station_id, p[3] AS name,
         CAST(floor(TRY_CAST(c[1] AS DOUBLE) * 1000) AS BIGINT) AS ts_ms,
         TRY_CAST(c[2] AS BIGINT) AS gmt_local_diff_sec,
         TRY_CAST(c[3] AS BIGINT) AS gmt_servertime_diff_sec,
         TRY_CAST(p[4] AS DOUBLE) AS lat, TRY_CAST(p[5] AS DOUBLE) AS lon,
         TRY_CAST(p[6] AS BIGINT) AS bikes, TRY_CAST(p[7] AS BIGINT) AS spaces,
         lower(p[8]) = 'true' AS installed,
         lower(p[9]) = 'true' AS locked,
         lower(p[10]) = 'true' AS temporary,
         TRY_CAST(p[11] AS BIGINT) AS total_docks,
         lower(p[12]) = 'true' AS givesbonus_acceptspedelecs_fbbattlevel,
         TRY_CAST(p[13] AS BIGINT) AS pedelecs,
         regexp_extract(filename, 'dt=(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) AS snapshot_date,
         epoch_ms(strptime(
           regexp_extract(filename,
             'wrm_stations_(\\d{{4}}-\\d{{2}}-\\d{{2}}_\\d{{2}}-\\d{{2}}-\\d{{2}})\\.txt$', 1),
           '%Y-%m-%d_%H-%M-%S')) AS file_ts_ms,
         regexp_extract(filename, '([^/]+)$', 1) AS src_file
  FROM split
  WHERE len(p) = 13 AND len(c) = 3
),
valid AS (
  SELECT *,
         CASE WHEN regexp_matches(station_id, '^[0-9]+$')
                   AND NOT starts_with(name, 'BIKE') THEN 'station'
              WHEN starts_with(station_id, 'fb')
                   AND starts_with(name, 'BIKE') THEN 'bike'
              ELSE 'unknown' END AS record_type
  FROM typed
  WHERE ts_ms IS NOT NULL AND gmt_local_diff_sec IS NOT NULL
    AND gmt_servertime_diff_sec IS NOT NULL AND lat IS NOT NULL
    AND lon IS NOT NULL AND bikes IS NOT NULL AND spaces IS NOT NULL
    AND total_docks IS NOT NULL AND pedelecs IS NOT NULL
)
SELECT station_id, name, ts_ms, gmt_local_diff_sec, gmt_servertime_diff_sec,
       lat, lon, bikes, spaces, installed, locked, temporary, total_docks,
       givesbonus_acceptspedelecs_fbbattlevel, pedelecs, record_type,
       snapshot_date, file_ts_ms, src_file
FROM valid
WHERE record_type = 'station'
QUALIFY row_number() OVER (
  PARTITION BY station_id ORDER BY snapshot_date DESC, file_ts_ms DESC
) = 1
"""


@query("wrm_latest_snapshot", oracle=_WRM_ORACLE)
def wrm_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest snapshot per station through the REAL pipeline operators:
    process_partition (parse + lineage) → enhance (classification,
    partition date) per dt → union → latest_per_station (W1 window).
    ``sf_dir`` is unused — the input is the generated landing fixture,
    the same files the oracle parses.

    Reference parity: processed_all.py parse/drop rules,
    enhanced_all.py classification, create_enhanced_views.py:84-94
    latest view.
    """
    from ..operators.enhance import enhance_all
    from ..operators.parse import read_raw_partition
    from ..operators.views import latest_per_station

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = ensure_fixture()
    # Whole-tree single-scan backfill: read_raw_partition with no dt
    # scans every partition in one job and enhance_all derives each
    # row's date from its dt= path segment — one plan instead of a
    # per-day read+enhance+union loop (one Spark job per day).
    enhanced = enhance_all(read_raw_partition(spark, root))
    latest = latest_per_station(enhanced)
    return latest.select(
        "station_id",
        "name",
        F.unix_millis(F.col("timestamp")).alias("ts_ms"),
        "gmt_local_diff_sec",
        "gmt_servertime_diff_sec",
        "lat",
        "lon",
        "bikes",
        "spaces",
        "installed",
        "locked",
        "temporary",
        "total_docks",
        "givesbonus_acceptspedelecs_fbbattlevel",
        "pedelecs",
        "record_type",
        F.date_format("date", "yyyy-MM-dd").alias("snapshot_date"),
        F.unix_millis(F.col("file_timestamp")).alias("file_ts_ms"),
        F.regexp_extract(F.col("s3_source_key"), "([^/]+)$", 1).alias("src_file"),
    )
