"""Skew-mitigation helpers (build spec: "skewed keys → salting or AQE
skew-join").

AQE's skew-join splitting (on in session.py) handles most sort-merge-join
skew at runtime; these helpers cover the two cases AQE cannot:

- `salted_aggregate`: a groupBy where one key dominates (e.g. one language
  in a corpus rollup, one hot user in an event stream).  Two-stage form:
  partial agg on (key, salt), final agg on key.  The hot key's rows spread
  over `n_salts` reducers in stage one.
- `salted_join`: a shuffle join against a SMALL-but-too-big-to-broadcast
  side with skewed keys: the big side gets a random salt, the small side
  is replicated n_salts times — every salted key finds its match, hot keys
  fan across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS_DEFAULT = 16


def with_salt(df: DataFrame, n_salts: int = N_SALTS_DEFAULT, col_name: str = "__salt") -> DataFrame:
    """Per-row round-robin salt within each input partition.

    A content hash is NOT a valid salt: a hot key's rows are usually
    byte-identical, so hashing all columns sends them to ONE reducer —
    exactly the skew being mitigated.  monotonically_increasing_id()
    increments by 1 within a partition, so pmod(id, n) cycles 0..n-1 —
    an even spread no matter how duplicated the rows are.  Deterministic
    for a fixed input partition layout (a plain task retry reproduces it);
    a full stage re-plan may re-deal salts, which only re-balances the
    partial-aggregate split, never the final per-key result."""
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    finals: list[Column],
    n_salts: int = N_SALTS_DEFAULT,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    `aggs` are the partial aggregates over (keys + salt); `finals` combine
    the partials per key.  Example — skew-safe count and sum:

        salted_aggregate(df, ["k"],
                         aggs=[F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
                         finals=[F.sum("c").alias("cnt"), F.sum("s").alias("sum_v")])
    """
    partial = with_salt(df, n_salts).groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = N_SALTS_DEFAULT,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values (small grows n_salts×; keep it small), join on
    keys + salt.  Output drops the salt column."""
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [*on, "__salt"], how)
    return out.drop("__salt")
