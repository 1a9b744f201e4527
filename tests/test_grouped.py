from __future__ import annotations

import math

from bike_data_flow_spark.operators.grouped import trend_slope_pandas
from bike_data_flow_spark.queries.relational4 import user_value_trend

SF = "/root/testdata/sf0.001"


def test_pandas_slope_matches_native_regr_slope(spark):
    native = {
        r["user_id"]: r["slope_per_hour"]
        for r in user_value_trend(spark, SF).collect()
    }
    from bike_data_flow_spark.tables import load

    pandas_ver = {
        r["user_id"]: r["slope_per_hour"]
        for r in trend_slope_pandas(load(spark, SF, "events")).collect()
    }
    assert set(native) == set(pandas_ver)
    for uid, slope in native.items():
        if slope is None:
            assert pandas_ver[uid] is None or math.isnan(pandas_ver[uid])
        else:
            # native side is rounded to 6 dp in the query output
            assert math.isclose(pandas_ver[uid], slope, abs_tol=5.1e-7)
