"""Deduplication operators over the `documents` table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard verification.  The core training-data-pipeline
surface for a 100 TB corpus.

Scale design
------------
- Exact dedup: one hash per doc (fingerprint), group on the 16-byte key —
  the shuffle carries doc_id+hash only, never text.
- MinHash: signatures are computed scan-side with array expressions (no
  explode, no shuffle); LSH banding turns the O(n²) pair space into
  per-bucket joins.  Buckets are the shuffle key; skewed buckets are
  AQE-splittable.
- Jaccard verify runs only on LSH candidates, never all pairs.
- SimHash: 16-bit signature via md5-derived bit votes; near-dup = equal
  code (or Hamming ≤ k via code-rotation joins at scale).

Portability: hashes are md5-hex (identical in Spark and DuckDB), minhash =
lexicographic min of seeded md5 strings — a valid uniform minhash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import read_table
from .relational import _register

N_MINHASH = 4  # seeds 0..3; bands of 2 → 2 bands
JACCARD_THRESHOLD = 0.30


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), "\\s+", " ")


_NORM_SQL = "REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')"


def shingles_df(spark, sf_dir) -> DataFrame:
    """doc_id + array of distinct word-3-gram shingles (scan-side, no
    shuffle).  Docs shorter than 3 tokens contribute their whole text."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(_norm_text(F.col("text")), " ")
    n = F.size(toks)
    sh = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array(_norm_text(F.col("text"))))
    return d.select("doc_id", F.array_distinct(sh).alias("shingles"))


_SHINGLES_SQL = f"""
      SELECT doc_id,
             list_distinct(CASE WHEN LEN(toks) >= 3 THEN
               list_transform(generate_series(1, LEN(toks) - 2),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             ELSE [norm] END) AS shingles
      FROM (SELECT doc_id, {_NORM_SQL} AS norm,
                   string_split({_NORM_SQL}, ' ') AS toks
            FROM documents)
"""


def minhash_cols(shingle_col, n: int = N_MINHASH):
    """Minhash value j = lexicographic min over shingles of md5(j|shingle).
    min of a uniform hash per seed → standard minhash estimator."""
    def seeded(j: int):
        # NB: must be a 1-arg lambda — F.transform treats 2-arg lambdas as
        # (element, index), which would silently shadow the seed.
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s).cast("binary"))

    return [F.array_min(F.transform(shingle_col, seeded(j))).alias(f"mh{j}") for j in range(n)]


def _minhash_sql_cols(n: int = N_MINHASH) -> str:
    return ",\n             ".join(
        f"list_aggregate(list_transform(shingles, s -> MD5('{j}|' || s)), 'min') AS mh{j}"
        for j in range(n)
    )


# ---------------------------------------------------------------------------
# x1: exact dedup by content fingerprint
# ---------------------------------------------------------------------------
@_register(
    "x1_dedup_exact",
    "Exact dedup: canonical doc per content fingerprint (min doc_id wins), "
    "copy count per group.  Shuffle key is the 32-char hash, not the text.",
    f"""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id,
           COUNT(*) OVER (PARTITION BY fp) AS n_copies
    FROM (SELECT doc_id, MD5({_NORM_SQL}) AS fp FROM documents)
    ORDER BY doc_id
    """,
    ("dedup", "pipeline"),
)
def x1(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    fp = F.md5(_norm_text(F.col("text")).cast("binary"))
    w = Window.partitionBy("fp")
    return (
        d.select("doc_id", fp.alias("fp"))
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x2: minhash signatures
# ---------------------------------------------------------------------------
@_register(
    "x2_minhash_signature",
    "Per-doc MinHash signature (4 seeded md5-min values over word-3-gram "
    "shingles).  Computed entirely scan-side with array expressions — zero "
    "shuffle, zero UDF.",
    f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT doc_id,
             {_minhash_sql_cols()}
    FROM sh ORDER BY doc_id
    """,
    ("dedup", "minhash", "pipeline"),
)
def x2(spark, sf_dir):
    sh = shingles_df(spark, sf_dir)
    return sh.select("doc_id", *minhash_cols(F.col("shingles"))).orderBy("doc_id")


# ---------------------------------------------------------------------------
# x3: MinHash-LSH candidate pairs + exact Jaccard verification
# ---------------------------------------------------------------------------
@_register(
    "x3_minhash_lsh_pairs",
    "Near-dup pairs: LSH banding (2 bands × 2 rows) proposes candidates, "
    "exact shingle-set Jaccard >= 0.3 confirms.  The pair join is bounded "
    "by band buckets — never O(n²) over the corpus.",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, shingles,
             {_minhash_sql_cols()}
      FROM sh),
    bands AS (
      SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bkey FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, mh2 || '|' || mh3 AS bkey FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN ex ea ON ea.doc_id = c.doc_a
      JOIN ex eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
    ("dedup", "minhash", "lsh", "jaccard", "pipeline"),
)
def x3(spark, sf_dir):
    sh = shingles_df(spark, sf_dir).cache()
    sig = sh.select("doc_id", "shingles", *minhash_cols(F.col("shingles")))
    bands = sig.select(
        "doc_id", F.lit(0).alias("band"), F.concat_ws("|", "mh0", "mh1").alias("bkey")
    ).unionAll(
        sig.select("doc_id", F.lit(1).alias("band"), F.concat_ws("|", "mh2", "mh3").alias("bkey"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ea = ex.alias("ea")
    eb = ex.alias("eb")
    inter = (
        cand.join(ea, F.col("ea.doc_id") == F.col("doc_a"))
        .join(eb, (F.col("eb.doc_id") == F.col("doc_b")) & (F.col("eb.s") == F.col("ea.s")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# x4: SimHash signatures
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 16


@_register(
    "x4_simhash",
    "16-bit SimHash per doc: each bit is the majority vote over tokens of "
    "one md5-hex-digit parity.  Near-dups share codes (Hamming-adjacent "
    "codes joinable via rotation at scale).  Explode+sum form — the "
    "aggregation is map-side combinable.",
    f"""
    WITH tok AS (
      SELECT doc_id, MD5(UNNEST(string_split({_NORM_SQL}, ' '))) AS h
      FROM documents),
    votes AS (
      SELECT doc_id,
             {", ".join(
                 f"SUM(2 * ((STRPOS('0123456789abcdef', SUBSTR(h, {j + 1}, 1)) - 1) % 2) - 1) AS v{j}"
                 for j in range(_SIMHASH_BITS)
             )}
      FROM tok GROUP BY doc_id)
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))}
                AS BIGINT) AS simhash
    FROM votes ORDER BY doc_id
    """,
    ("dedup", "simhash", "pipeline"),
)
def x4(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("t")).select(
        "doc_id", F.md5(F.col("t").cast("binary")).alias("h")
    )
    # hex-digit parity: conv(digit,16,10) % 2 ≡ (strpos('0..f',digit)-1) % 2
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(2 * (F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int") % 2) - 1).alias(f"v{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    code = F.lit(0)
    for j in range(_SIMHASH_BITS):
        code = code + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select("doc_id", code.cast("bigint").alias("simhash")).orderBy("doc_id")
