"""Serving warm-up: build every session-index artifact up front.

A serving session (the online ANN path in streaming/ann.py, a dashboard
issuing the declared queries, the driver's correctness sweep) otherwise
pays each index build inside whichever query touches it first.  One call
here materializes the shared feeds — gated corpus, LSH signature table,
IVF cells, exact-eval ground truth, shingle/MinHash/SimHash tables — so
every later query runs at its warm cost.  This is the session twin of a
lake pipeline's "build the index tables, then open the query endpoint"
startup, and it is deliberately an explicit call: nothing in the engine
warms implicitly, so batch-only sessions never pay for artifacts they
don't use.

Returns {artifact: row_count} — the counts are the materializing actions,
and non-zero counts double as a cheap ingest sanity check.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def warm_session_index(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    from .operators.dedup import (
        _max_df,
        minhash_sig_index,
        shingle_index,
        simhash_code_index,
    )
    from .operators.similarity import (
        N_CELLS,
        N_PROBE,
        SIG_PLANES,
        V12_NQ,
        _emb,
        _exact_topk,
        _exact_topk_v12,
        _ivf_cells_probes,
        _pq_index,
        _rpq_index,
        _sig,
        _tivf_cells_probes,
    )

    counts: dict[str, int] = {}
    counts["emb"] = _emb(spark, sf_dir).count()
    counts[f"sig{SIG_PLANES}"] = _sig(spark, sf_dir, SIG_PLANES).count()
    _, cells, probes = _ivf_cells_probes(spark, sf_dir, N_PROBE)
    counts["ivf_cells"] = cells.count()
    counts["ivf_probes"] = probes.count()
    _, _, probes_w = _ivf_cells_probes(spark, sf_dir, N_PROBE, V12_NQ)
    counts["ivf_probes_eval"] = probes_w.count()
    _, _, probes_sweep = _ivf_cells_probes(spark, sf_dir, N_CELLS, V12_NQ)
    counts["ivf_probes_sweep"] = probes_sweep.count()
    _, tcells, tprobes = _tivf_cells_probes(spark, sf_dir, N_PROBE)
    counts["tivf_cells"] = tcells.count()
    counts["tivf_probes"] = tprobes.count()
    _, _, tprobes_w = _tivf_cells_probes(spark, sf_dir, N_PROBE, V12_NQ)
    counts["tivf_probes_eval"] = tprobes_w.count()
    # full-probe sweep table for v22 — warmed exactly like the seed
    # quantizer's (ivf_probes_sweep for v18), so the two fused sweeps
    # bench under the same warm-index methodology
    _, _, tprobes_sweep = _tivf_cells_probes(spark, sf_dir, N_CELLS, V12_NQ)
    counts["tivf_probes_sweep"] = tprobes_sweep.count()
    _, _, pq_codes = _pq_index(spark, sf_dir)
    counts["pq_codes"] = pq_codes.count()
    counts["rpq_codes"] = _rpq_index(spark, sf_dir)[2].count()
    counts["exact_topk"] = _exact_topk(spark, sf_dir).count()
    counts["exact_topk_v12"] = _exact_topk_v12(spark, sf_dir).count()
    counts["shingles"] = shingle_index(spark, sf_dir).count()
    counts["mh_sig16"] = minhash_sig_index(spark, sf_dir).count()
    counts["simhash16"] = simhash_code_index(spark, sf_dir).count()
    counts["simhash64"] = simhash_code_index(spark, sf_dir, wide=True).count()
    _max_df(spark, sf_dir)  # scalar stat; cached, nothing to count
    return counts
