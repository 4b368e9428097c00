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


# ---------------------------------------------------------------------------
# asof_join vs pandas merge_asof (independent reference implementation)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def asof_cases():
    cases = []
    key_st = st.integers(min_value=0, max_value=3)
    t_st = st.integers(min_value=0, max_value=20)

    @settings(max_examples=40, deadline=None, derandomize=True)
    @given(
        st.lists(st.tuples(key_st, t_st), min_size=1, max_size=15),
        st.lists(st.tuples(key_st, t_st, st.integers(0, 99)), min_size=0, max_size=15),
    )
    def collect(lefts, rights):
        cases.append((lefts, rights))

    collect()
    return cases


def test_asof_join_matches_pandas(spark, asof_cases):
    """The union-tag window as-of equals pandas merge_asof (backward,
    allow_exact_matches) on randomized keyed event/version tables,
    including the greatest-tiebreak rule on equal timestamps."""
    from fifteenmc_spark.operators.relational import asof_join

    lrows, rrows = [], []
    for ci, (lefts, rights) in enumerate(asof_cases):
        for li, (k, t) in enumerate(lefts):
            lrows.append((ci * 1000 + li, ci * 10 + k, t))
        for ri, (k, t, v) in enumerate(rights):
            rrows.append((ci * 10 + k, t, ri, v))  # tiebreak = ri (unique)
    left = spark.createDataFrame(lrows, "lid BIGINT, k BIGINT, t BIGINT")
    right = spark.createDataFrame(rrows, "k BIGINT, rt BIGINT, tb BIGINT, v BIGINT")
    got = {
        r["lid"]: (r["tb"], r["v"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["tb", "v"], tiebreak="tb",
        ).collect()
    }

    lpdf = pd.DataFrame(lrows, columns=["lid", "k", "t"]).sort_values("t")
    rpdf = pd.DataFrame(rrows, columns=["k", "rt", "tb", "v"]).sort_values(["rt", "tb"])
    if len(rpdf):
        merged = pd.merge_asof(
            lpdf, rpdf, left_on="t", right_on="rt", by="k",
            direction="backward", allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.tb) else int(r.tb), None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    else:
        want = {int(r.lid): (None, None) for r in lpdf.itertuples()}
    assert got == want


def test_asof_join_nullable_tiebreak(spark, asof_cases):
    """Equal-timestamp winners with a NULLABLE tiebreak column follow
    ``ORDER BY tb DESC NULLS LAST`` oracle semantics: a NULL tiebreak loses
    to any non-NULL, and NULL wins only when every candidate is NULL.
    Oracle is an independent pure-Python scan (not merge_asof, which can't
    express the tiebreak rule)."""
    from fifteenmc_spark.operators.relational import asof_join

    lrows, rrows = [], []
    for ci, (lefts, rights) in enumerate(asof_cases):
        for li, (k, t) in enumerate(lefts):
            lrows.append((ci * 1000 + li, ci * 10 + k, t))
        for ri, (k, t, v) in enumerate(rights):
            # every third right row gets a NULL tiebreak; v stays as payload
            tb = None if ri % 3 == 0 else v
            rrows.append((ci * 10 + k, t, tb, ri))
    left = spark.createDataFrame(lrows, "lid BIGINT, k BIGINT, t BIGINT")
    right = spark.createDataFrame(rrows, "k BIGINT, rt BIGINT, tb BIGINT, rid BIGINT")
    got = {
        r["lid"]: (r["tb"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["tb", "rid"], tiebreak="tb",
        ).collect()
    }

    def winners(k, t):
        """All acceptable (tb, rid) answers: rows tied on (rt, tb) have no
        further sort key in the window, so any of them may win."""
        cands = [(rt, tb, rid) for (rk, rt, tb, rid) in rrows if rk == k and rt <= t]
        if not cands:
            return {(None, None)}
        key = lambda c: (c[0], c[1] is not None, c[1] if c[1] is not None else 0)
        top = key(max(cands, key=key))
        return {(tb, rid) for (rt, tb, rid) in cands if key((rt, tb, rid)) == top}

    for (lid, k, t) in lrows:
        assert got[lid] in winners(k, t), (lid, k, t, got[lid], winners(k, t))


# ---------------------------------------------------------------------------
# vectorized cosine vs an independent per-element reference
# ---------------------------------------------------------------------------
def test_cosine_batch_matches_scalar_reference(spark):
    """The Arrow-batched einsum cosine must agree with a left-to-right
    per-element double accumulation (the oracle SQL's term order) to well
    inside the 4-decimal compare, across magnitude extremes, negatives,
    and near-orthogonal pairs."""
    import math
    import random

    import numpy as np

    from fifteenmc_spark.operators.similarity import EMB_DIM, cosine

    rng = random.Random(7)
    rows = []
    for i in range(200):
        scale_a = 10.0 ** rng.randint(-18, 18)
        scale_b = 10.0 ** rng.randint(-18, 18)
        a = [rng.uniform(-1, 1) * scale_a for _ in range(EMB_DIM)]
        b = [rng.uniform(-1, 1) * scale_b for _ in range(EMB_DIM)]
        if i % 7 == 0:  # exactly-identical pair: cosine must be ~1
            b = list(a)
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "pair_id long, a array<double>, b array<double>")
    got = {
        r["pair_id"]: r["sim"]
        for r in df.select("pair_id", cosine(F.col("a"), F.col("b")).alias("sim")).collect()
    }

    def scalar_cos(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    for pid, a, b in rows:
        assert abs(got[pid] - scalar_cos(a, b)) < 1e-9, pid


# ---------------------------------------------------------------------------
# p5 chunk kernel vs a straightforward reference (pure Python — no Spark)
# ---------------------------------------------------------------------------
def test_chunk_batch_matches_reference():
    """The Arrow chunk+hash kernel must (a) partition its input exactly —
    joining the chunks back with single spaces reproduces the normalized
    text, every chunk has <= w tokens and all but the last exactly w —
    and (b) key each chunk with the md5 both engines compute.  Randomized
    over token counts 0..37, w in {1,2,5,7}, plus the NULL/empty edge
    rows the edge corpus pins."""
    import hashlib
    import random

    import pandas as pd

    from fifteenmc_spark.operators.textops import _chunk_batch

    rng = random.Random(11)
    texts = [None, "", "solo"]
    for _ in range(120):
        n = rng.randint(0, 37)
        texts.append(" ".join(f"t{rng.randint(0, 9)}" for _ in range(n)) if n else "")
    for w in (1, 2, 5, 7):
        out = _chunk_batch(pd.Series(texts, dtype="object"), w)
        for t, chunks, cks in zip(texts, out["chunks"], out["cks"]):
            if t is None:
                assert chunks == [] and cks == []
                continue
            # partition property: rebuild == input (already normalized)
            assert " ".join(chunks) == t, (w, t, chunks)
            toks = t.split(" ")
            assert len(chunks) == (len(toks) + w - 1) // w
            for i, c in enumerate(chunks):
                want_w = w if i < len(chunks) - 1 else len(toks) - w * i
                assert len(c.split(" ")) == want_w
            assert cks == [hashlib.md5(c.encode("utf-8")).hexdigest() for c in chunks]


class TestSnapDiscBoxes:
    """Containment property of the shared z-order pruning geometry
    (plans/snap.snap_disc_boxes, rewritten r14): EVERY point within
    max_snap_m haversine meters of the query point must fall inside one
    of the returned boxes — across the antimeridian, at the poles, and
    at box-edge coordinates.  The destination points are generated with
    the spherical direct formula at R_QUERY (6371000 m) > R_MIN, so
    their angular distance is strictly inside the boxes' R_MIN-derived
    radius by construction; a containment failure is a geometry bug,
    never a margin artifact."""

    @staticmethod
    def _dest(lon, lat, bearing_deg, dist_m, radius=6_371_000.0):
        import math

        d = dist_m / radius
        th = math.radians(bearing_deg)
        p1, l1 = math.radians(lat), math.radians(lon)
        p2 = math.asin(
            math.sin(p1) * math.cos(d) + math.cos(p1) * math.sin(d) * math.cos(th)
        )
        l2 = l1 + math.atan2(
            math.sin(th) * math.sin(d) * math.cos(p1),
            math.cos(d) - math.sin(p1) * math.sin(p2),
        )
        lon2 = math.degrees(l2)
        # normalize to [-180, 180) — the storage convention the residual
        # filter sees
        lon2 = (lon2 + 180.0) % 360.0 - 180.0
        return lon2, math.degrees(p2)

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(min_value=-180.0, max_value=180.0),
        st.floats(min_value=-90.0, max_value=90.0),
        st.floats(min_value=1.0, max_value=5000.0),
        st.floats(min_value=0.0, max_value=360.0),
        st.floats(min_value=0.0, max_value=1.0),
    )
    def test_disc_points_always_contained(self, lon, lat, snap_m, bearing, frac):
        from fifteenmc_spark.plans.snap import snap_disc_boxes

        boxes = snap_disc_boxes(lon, lat, snap_m)
        plon, plat = self._dest(lon, lat, bearing, snap_m * frac)
        assert any(
            b[0] <= plon < b[2] and b[1] <= plat < b[3] for b in boxes
        ), (lon, lat, snap_m, bearing, frac, plon, plat, boxes)
