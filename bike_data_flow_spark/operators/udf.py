"""UDF escape-hatch surface (SURVEY §2.10).

The reference's "UDFs" were arbitrary pandas code inside assets; here
every hot-path computation is a native expression, and this module is
the sanctioned drop-into-Python surface:

- `haversine_native`: the preferred spelling — pure Column math.
- `haversine_pandas_udf`: the same function as an Arrow-vectorized
  pandas UDF (tests pin it equal to the native one) — the template for
  math Spark genuinely can't express.
- `register_sql_udf`: spark.udf.register passthrough so SQL users get
  the same hatch (`SELECT my_fn(col) FROM t`).

Row-at-a-time `F.udf` is deliberately NOT wrapped: at 100 TB the
ser/de tax per row is the difference between hours and days; Arrow
batches are the floor.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

EARTH_RADIUS_M = 6371000.0


def haversine_native(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, as whole-stage-codegen math."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


@F.pandas_udf(DoubleType())
def haversine_pandas_udf(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    import numpy as np

    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = (
        np.sin(dlat / 2) ** 2
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def register_sql_udf(spark: SparkSession, name: str = "haversine_m"):
    """Expose the pandas UDF to SQL: SELECT haversine_m(a,b,c,d)."""
    spark.udf.register(name, haversine_pandas_udf)
    return name


def haversine_map_in_arrow(df, lat1: str, lon1: str, lat2: str, lon2: str, out: str = "dist_m"):
    """The third escape-hatch rung: `mapInArrow` — raw Arrow
    RecordBatches in and out, no pandas materialization at all. One
    copy cheaper than a pandas UDF (no Series wrapping), the right
    rung when the Python side is itself Arrow-native (polars, duckdb,
    vector codecs). Same math as the other two spellings; tests pin
    all three equal."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import StructField, StructType

    # NOT df.schema.add(...): StructType.add mutates the cached schema
    # object in place, corrupting the *input* DataFrame's column list.
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out, DoubleType())]
    )

    def compute(batches):
        for b in batches:
            la1 = np.radians(b.column(lat1).to_numpy(zero_copy_only=False))
            lo1 = np.radians(b.column(lon1).to_numpy(zero_copy_only=False))
            la2 = np.radians(b.column(lat2).to_numpy(zero_copy_only=False))
            lo2 = np.radians(b.column(lon2).to_numpy(zero_copy_only=False))
            a = (
                np.sin((la2 - la1) / 2) ** 2
                + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
            )
            d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))
            yield b.append_column(out, pa.array(d, type=pa.float64()))

    return df.mapInArrow(compute, out_schema)


def register_ngram_udtf(spark: SparkSession, name: str = "token_ngrams"):
    """The fourth rung: a Python UDTF (Spark 4 `@udtf`) — one input row
    → many output rows, callable from SQL's FROM clause with LATERAL
    correlation. Registered on demand (not at import) so module import
    never needs a live session.

    Used as: SELECT d.doc_id, g.pos, g.ngram
             FROM documents d, LATERAL token_ngrams(d.text, 3) g

    Prefer the native explode(shingles_from_tokens(...)) spelling in
    hot paths (JVM-side, no Python workers); the UDTF is the sanctioned
    hatch for row-expanding logic Spark genuinely can't express.
    Tests pin the two spellings equal.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class TokenNgrams:
        def eval(self, text: str, n: int):
            if text is None or n is None or n <= 0:
                return
            toks = text.lower().strip().split()
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    spark.udtf.register(name, TokenNgrams)
    return name
