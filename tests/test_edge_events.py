"""Edge-events hardening: the event-stream queries vs their DuckDB oracles
on a pathological fixture — NULL timestamps, NULL user ids, malformed /
NULL / wrong-typed JSON props, same-timestamp ties, a pre-epoch timestamp.

Pinned semantics (each was an engine/oracle divergence before):

- window ORDER BY ts writes NULLS FIRST explicitly (d12, d23's rank twin)
  — Spark's default, DuckDB's opposite.
- sessionization excludes NULL-ts events on both sides (d28) — no gap can
  be computed for an event with no time.
- JSON extraction treats dirty props as data: malformed JSON → NULL
  (json_valid guard in the oracle; DuckDB's extractor raises), non-numeric
  field values → NULL via try_cast instead of an ANSI cast failure (d29).
"""

from __future__ import annotations

import datetime as dt
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fifteenmc_spark.operators.relational import QUERIES

from .oracle_util import compare

_T0 = dt.datetime(2024, 1, 1)


def _t(mins, secs=0):
    return _T0 + dt.timedelta(minutes=mins, seconds=secs)


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, _t(0), 1, "click", 1.0, '{"k": 1}'),
    (1, _t(5), 1, "click", 2.0, '{"k": 2}'),
    (2, _t(40), 1, "view", 3.0, "not json at all"),
    (3, _t(41), 1, "view", None, None),
    (4, None, 1, "click", 4.0, '{"k": 3}'),
    (5, _t(10), None, "click", 5.0, '{"k": 4}'),
    (6, _t(10), 2, "click", 6.0, "{}"),
    (7, _t(10), 2, "click", 7.0, '{"k": null}'),
    (8, _t(10, 1), 2, "purchase", 8.0, '{"k": "str"}'),
    (9, _t(10, 1), 2, "purchase", 9.0, '{"k": 87, "extra": [1,2]}'),
    (10, dt.datetime(1969, 12, 31, 23, 59), 3, "click", 1.5, '{"k": 5}'),
    (11, _t(10), 1, "click", 2.5, '{"k": 6}'),
    # NULL event_type: GROUP BY retains the NULL group in both engines, so
    # every grouped query must carry it through joins/windows — d31's
    # counts-pcts join-back is null-safe equality for exactly this row
    # pair (r12 ADVICE: a plain inner join would silently drop the group)
    (12, _t(20), 4, None, 3.5, '{"k": 7}'),
    (13, _t(21), 5, None, 4.5, None),
]

EVENT_QUERIES = [
    "d11_range_frame",
    "d12_lag",
    "d18_date_trunc",
    "d19_tumbling_window",
    "d23_first_occurrence",
    "d26_asof_join",
    "d27_range_join",
    "d28_sessionize",
    "d29_json_extract",
    # d31 on pathological events: NULL user_ids are ignored by both the
    # exact COUNT DISTINCT and both engines' HLLs; NULL values are
    # ignored by both percentile forms; the all-NULL-user group divide
    # is guarded (GREATEST(exact, 1))
    "d31_sketch_bounds",
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory, sf_small):
    d = tmp_path_factory.mktemp("edge_events_sf")
    tb = pa.table(
        {
            "event_id": pa.array([e[0] for e in EDGE_EVENTS], pa.int64()),
            "ts": pa.array([e[1] for e in EDGE_EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in EDGE_EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in EDGE_EVENTS], pa.string()),
            "value": pa.array([e[4] for e in EDGE_EVENTS], pa.float64()),
            "props": pa.array([e[5] for e in EDGE_EVENTS], pa.string()),
        }
    )
    pq.write_table(tb, str(d / "events.parquet"))
    # d26's asof join reads orders as its right side — the real one is fine
    shutil.copy(f"{sf_small}/orders.parquet", str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_events_oracle(edge_events_dir):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_events_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(name, spark, edge_events_dir, edge_events_oracle):
    q = QUERIES[name]
    sdf = q.build(spark, edge_events_dir)
    pdf = edge_events_oracle.execute(q.oracle).fetchdf()
    compare(sdf, pdf, f"edge-events:{name}")


def test_d29_dirty_props_become_null_not_errors(spark, edge_events_dir):
    """Malformed JSON, JSON null, and a non-numeric field value contribute
    NULL to the sum rather than crashing the query."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["d29_json_extract"].build(spark, edge_events_dir).collect()
    }
    assert rows["view"]["sum_k"] is None  # 'not json at all' + NULL props
    assert rows["purchase"]["sum_k"] == 87  # '"str"' nulls out, 87 survives
    assert rows["click"]["n"] == 8
