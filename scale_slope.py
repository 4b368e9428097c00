"""Scale-slope measurement: the heaviest query families timed at THREE
scale factors (10x apart) on BOTH engines, reporting the power-law
exponent b in t ~ (rows)^b — the measured evidence that the plans scale,
where the per-round bench (one SF, floor-dominated) can only argue it.

Method (r11, after the r10 ADVICE):
- Three points instead of two: sf0.01 and sf0.1 from the driver testdata
  plus a SYNTHESIZED 10x-sf0.1 corpus (documents + embeddings matched to
  the source tables' distributions — token FREQUENCY profile (words drawn
  from the concatenated source token stream, so the shingle-df shape the
  x5/x3/x9 plans are sensitive to carries over), doc-length mix,
  lang/source mix, dup rate, per-label unit-norm embedding clusters;
  seed=42; the other eight tables are symlinked from sf0.1 since no slope
  query touches them).  Two points fit any line; the third exposes
  curvature.  The cache marker fingerprints the source tables and
  invalidates on regeneration.
- The Spark action floor (measured noop write, recorded per SF) is
  SUBTRACTED from the Spark samples before fitting, clamped at 1 ms —
  without this the scheduler constant flattens every exponent at small
  SF and the flag can misfire in either direction (r10 ADVICE; the
  recorded r10 data had negative Spark exponents from exactly this).
- b = least-squares slope of log10(t_adj) over log10(relative rows);
  bench noise is +-30-40% at these absolute times, so read b with that
  error bar in mind (the JSON carries the raw medians for re-fits).

Reading guide: b ~ 1 linear (a one-pass scan+shuffle plan), b < 1
floor/constant-dominated (headroom, not a defect), b > 0.9 is flagged
for attention (watch_spark) and b > 1.1 flagged superlinear — a
candidate-pair or window stage growing faster than the corpus.

Methodology matches bench.py: warm tables + Python worker fleet first,
median-of-$BENCH_RUNS (default 3) through a noop sink (Spark) /
fetchall (DuckDB), warm-session index semantics.  Writes
SCALE_SLOPE.json and prints one compact JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import fifteenmc_spark.operators  # noqa: F401  (registers all query modules)
from fifteenmc_spark.io import TABLES, read_table
from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.session import get_spark

# the heaviest families by the r9/r10 benches (r9 verdict Next #5) plus
# the r10-new heavy evals (composed plans / fused sweep / trained
# composition)
SLOPE_QUERIES = (
    "x5_ngram_jaccard",
    # the scale paths for x5's measured superlinear tail (exact all-pairs
    # Jaccard is inherently ~quadratic as df grows on a bounded vocab —
    # r11 measured spark tail 1.39 vs duckdb 1.91): the max-df-capped
    # exact variant and the MinHash-LSH approximate variant must stay
    # subquadratic where x5 bends
    "x5_ngram_jaccard_capped",
    "x3_minhash_lsh_pairs",
    "x9_span_dedup",
    # mitigation (c): same answer as x9, singleton-hash prefilter before
    # the join-back — the slope run also records its join-input reduction
    # at each SF (x9_prefilter_reduction below)
    "x9_span_dedup_prefiltered",
    "v1_cosine_topk",
    "v11_pq_topk",
    "v13_ivfpq_topk",
    "t9_unigram_logprob",
    "v17_encoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v21_tivfpq_topk",
)
SF_LO = os.environ.get("SLOPE_SF_LO", "/root/testdata/sf0.01")
SF_HI = os.environ.get("SLOPE_SF_HI", "/root/testdata/sf0.1")
# the synthesized 10x-sf0.1 point; regenerated if absent
SF_XHI = os.environ.get("SLOPE_SF_XHI", "/tmp/fifteenmc_sf1_synth")
SYNTH_FACTOR = 10
WATCH = 0.9
SUPERLINEAR = 1.1


def synth_10x(src_dir: str, out_dir: str, factor: int = SYNTH_FACTOR) -> str:
    """Synthesize a ``factor``-x documents+embeddings corpus into
    ``out_dir``, distribution-matched to ``src_dir``'s tables, and
    symlink the remaining tables from ``src_dir``.  Deterministic
    (seed=42); idempotent (skips if the marker file exists)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Marker embeds a fingerprint of the SOURCE tables (size+mtime of the
    # two synthesized inputs, plus the factor and a method version): a
    # regenerated sf0.1 testdata invalidates the cached synth corpus
    # instead of being silently reused (r11 ADVICE).
    def _fingerprint() -> str:
        parts = [f"factor={factor}", "method=freqweighted-v2"]
        for t in ("documents", "embeddings"):
            st = os.stat(os.path.join(src_dir, f"{t}.parquet"))
            parts.append(f"{t}:{st.st_size}:{int(st.st_mtime)}")
        return "\n".join(parts) + "\n"

    marker = os.path.join(out_dir, f".synth_{factor}x_ok")
    fp = _fingerprint()
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fp:
                return out_dir
        # stale: wipe the cached corpus (symlinks included) and regenerate
        for name in os.listdir(out_dir):
            os.remove(os.path.join(out_dir, name))
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    docs = pq.read_table(os.path.join(src_dir, "documents.parquet")).to_pandas()
    # Draw words FREQUENCY-WEIGHTED from the concatenated source token
    # stream, not uniformly from the vocab set: the shingle df profile is
    # the exact statistic the x5/x3/x9 slope points and the
    # X5_HIGH_DF_FRAC dispatch threshold are calibrated on, and a uniform
    # draw makes every shingle common (high_frac ~= 1.0), an adversarial
    # synthesis artifact rather than a matched decade (r11 ADVICE).
    token_stream = np.concatenate([t.split() for t in docs["text"] if t])
    lens = docs["text"].str.split().str.len().to_numpy()
    n = len(docs) * factor
    out_lens = rng.choice(lens, size=n)
    texts = [" ".join(rng.choice(token_stream, size=int(k))) for k in out_lens]
    # plant exact duplicates at the source rate (copies of earlier docs)
    n_dup = max(1, round(docs["text"].duplicated().sum() / len(docs) * n))
    for i in rng.choice(np.arange(1, n), size=n_dup, replace=False):
        texts[int(i)] = texts[int(rng.integers(0, i))]
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(docs["lang"].to_numpy(), size=n), pa.string()),
            "source": pa.array(rng.choice(docs["source"].to_numpy(), size=n), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(doc_tbl, os.path.join(out_dir, "documents.parquet"))

    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet")).to_pandas()
    mat = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    labels = emb["label"].to_numpy()
    m = len(emb) * factor
    out_labels = rng.choice(labels, size=m)  # preserves the label mix
    dim = mat.shape[1]
    vecs = np.empty((m, dim), dtype=np.float64)
    for lb in np.unique(labels):
        mask = out_labels == lb
        mu = mat[labels == lb].mean(axis=0)
        sd = mat[labels == lb].std(axis=0)
        vecs[mask] = rng.normal(mu, sd, size=(int(mask.sum()), dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)  # source is unit-norm
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(m), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(out_labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(emb_tbl, os.path.join(out_dir, "embeddings.parquet"))

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), dst)
    with open(marker, "w") as f:
        f.write(fp)
    return out_dir


def _median(xs):
    import statistics

    return float(statistics.median(xs))


def _warm(spark, sf_dir):
    for t in TABLES:
        read_table(spark, sf_dir, t).count()
    par = spark.sparkContext.defaultParallelism

    def _identity(batches):
        yield from batches

    spark.range(par * 4).repartition(par).mapInPandas(_identity, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(par).repartition(par).write.format("noop").mode("overwrite").save()
        floor = min(floor, time.perf_counter() - t0)
    return floor


def _fit(xs, ys):
    """Least-squares slope of ys over xs (both already log10)."""
    nx = len(xs)
    mx, my = sum(xs) / nx, sum(ys) / nx
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    import duckdb

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf_dirs = [SF_LO, SF_HI, synth_10x(SF_HI, SF_XHI)]
    log_rows = [0.0, 1.0, 2.0]  # relative corpus size, log10
    spark = get_spark(app_name="fifteenmc-scale-slope")
    out: dict = {
        "metric": "scale_slope",
        "sf_dirs": sf_dirs,
        "method": (
            f"3-point least-squares over log10(t) vs log10(rows); Spark medians "
            f"floor-subtracted (clamped at 1ms) before the fit; median-of-{runs}; "
            "bench noise +-30-40% at these absolute times"
        ),
        "queries": {},
    }
    times: dict[str, dict[str, list[float]]] = {}
    floors: list[float] = []
    prefilter_rows: list[dict] = []

    for sf_dir in sf_dirs:
        floor = _warm(spark, sf_dir)
        floors.append(floor)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in SLOPE_QUERIES:
            q = QUERIES[name]
            s_samples, d_samples = [], []
            for _ in range(runs):
                t0 = time.perf_counter()
                q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                s_samples.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                d_samples.append(time.perf_counter() - t0)
            times.setdefault(name, {}).setdefault("spark", []).append(_median(s_samples))
            times[name].setdefault("duck", []).append(_median(d_samples))
        # evidence row for x9 mitigation (c): join-back input reduction at
        # this SF (r11 verdict item 3's "Done" condition for the 10x point)
        from fifteenmc_spark.operators.dedup import x9_prefilter_reduction

        prefilter_rows.append({"sf_dir": sf_dir} | x9_prefilter_reduction(spark, sf_dir))
    out["action_floor_s"] = [round(f, 4) for f in floors]
    out["x9_prefilter_reduction"] = prefilter_rows

    watch, superlinear = [], []
    for name in SLOPE_QUERIES:
        s = times[name]["spark"]
        d = times[name]["duck"]
        s_adj = [max(t - f, 1e-3) for t, f in zip(s, floors)]
        bs = _fit(log_rows, [math.log10(t) for t in s_adj])
        bd = _fit(log_rows, [math.log10(t) for t in d])
        # per-segment slopes too: the least-squares fit averages a
        # floor-flat first decade against the tail, and the TAIL segment
        # is the one that predicts the next decade — a family can fit
        # b=0.75 overall while its last segment is already superlinear
        seg_s = [
            round(math.log10(s_adj[i + 1] / s_adj[i]), 3) for i in range(len(s_adj) - 1)
        ]
        seg_d = [round(math.log10(d[i + 1] / d[i]), 3) for i in range(len(d) - 1)]
        out["queries"][name] = {
            "spark_s": [round(t, 4) for t in s],
            "duckdb_s": [round(t, 4) for t in d],
            "spark_exponent": round(bs, 3),
            "duckdb_exponent": round(bd, 3),
            "spark_segment_exponents": seg_s,
            "duckdb_segment_exponents": seg_d,
        }
        worst = max(bs, seg_s[-1])  # fitted or tail, whichever is worse
        if worst > SUPERLINEAR:
            superlinear.append(name)
        elif worst > WATCH:
            watch.append(name)
    out["superlinear_spark"] = superlinear
    out["watch_spark"] = watch

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SLOPE.json"), "w") as f:
        json.dump(out, f, indent=1)
    compact = {
        "metric": "scale_slope",
        "spark_exponents": {k: v["spark_exponent"] for k, v in out["queries"].items()},
        "duckdb_exponents": {k: v["duckdb_exponent"] for k, v in out["queries"].items()},
        "superlinear_spark": superlinear,
        "watch_spark": watch,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
