"""Property-based tests (hypothesis) for the scalar function library —
the cross-engine kernel the declared queries lean on.  Each property runs
one batched Spark job over all generated cases (not one job per case).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from fifteenmc_spark.functions import geo
from pyspark.sql import functions as F

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


def _hav_py(lon1, lat1, lon2, lat2, r):
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(min(1.0, max(0.0, a))))


@pytest.fixture(scope="module")
def hav_cases():
    cases = []

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(lon_st, lat_st, lon_st, lat_st)
    def collect(lon1, lat1, lon2, lat2):
        cases.append((lon1, lat1, lon2, lat2))

    collect()
    return cases


def test_haversine_properties(spark, hav_cases):
    pdf = pd.DataFrame(hav_cases, columns=["lon1", "lat1", "lon2", "lat2"])
    df = spark.createDataFrame(pdf)
    out = df.select(
        "*",
        geo.haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d"),
        geo.haversine_m(F.col("lon2"), F.col("lat2"), F.col("lon1"), F.col("lat1")).alias("d_rev"),
        geo.haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon1"), F.col("lat1")).alias("d_self"),
    ).toPandas()
    for r in out.itertuples():
        want = _hav_py(r.lon1, r.lat1, r.lon2, r.lat2, geo.R_EDGE_WEIGHTS_M)
        assert abs(r.d - want) < 1e-6 * max(1.0, want), "matches the scalar formula"
        assert abs(r.d - r.d_rev) < 1e-9 * max(1.0, r.d), "symmetry"
        assert r.d_self == 0.0, "identity"
        assert 0.0 <= r.d <= math.pi * geo.R_EDGE_WEIGHTS_M + 1e-6, "bounded by half circumference"


@pytest.fixture(scope="module")
def key_cases():
    cases = []

    @settings(max_examples=80, deadline=None, derandomize=True)
    @given(st.text(max_size=80))
    def collect(s):
        cases.append(s)

    collect()
    return cases


def _sanitize_py(s: str) -> str:
    import re

    s = s.lower()
    s = re.sub(r"[^a-z0-9._-]+", "_", s)
    s = re.sub(r"_+", "_", s)
    s = re.sub(r"^_|_$", "", s)
    return (s or "cat")[:60]


def test_sanitize_key_properties(spark, key_cases):
    pdf = pd.DataFrame({"s": key_cases})
    out = (
        spark.createDataFrame(pdf)
        .select("s", geo.sanitize_key(F.col("s")).alias("k"))
        .toPandas()
    )
    for r in out.itertuples():
        assert r.k == _sanitize_py(r.s), repr(r.s)
        # idempotence: sanitize(sanitize(x)) == sanitize(x)
        assert _sanitize_py(r.k) == r.k
        assert 1 <= len(r.k) <= 60


def test_edge_weight_clamp(spark):
    # zero-length edges clamp to exactly 0.01 m, float32
    df = spark.createDataFrame(pd.DataFrame({"lon": [18.6, 0.0], "lat": [54.3, 0.0]}))
    out = df.select(
        geo.edge_weight_m(F.col("lon"), F.col("lat"), F.col("lon"), F.col("lat")).alias("w")
    ).toPandas()
    import numpy as np

    assert np.allclose(out["w"], 0.01, rtol=1e-6)  # float32 storage of 0.01
