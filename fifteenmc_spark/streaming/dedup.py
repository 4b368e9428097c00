"""Streaming ingest deduplication (build spec: training-data pipeline ops
as first-class; the reference has no streaming runtime — SURVEY.md §2.9).

Two shapes a 100 TB/day document ingest actually needs:

- ``canonical_docs``: the streaming twin of declared query x1 — one
  canonical doc per content fingerprint with a copy count.  A plain
  aggregation, so the SAME builder runs batch and streaming (complete
  mode); the stream≡batch test is the correctness contract.
- ``dedup_events``: drop late duplicate deliveries (at-least-once sources
  re-deliver) by key.  On a stream it uses dropDuplicatesWithinWatermark,
  so state for a key is EVICTED once the watermark passes it — bounded
  state, the only form that survives unbounded ingest.  On a batch frame
  it degrades to plain dropDuplicates.

Scale notes
-----------
- canonical_docs shuffles (fp, doc_id) — 40 bytes/doc, never text; the
  aggregation is map-side combinable.
- dedup_events state is keyed by the dedup key; watermark eviction keeps
  it at O(keys per watermark window), not O(keys ever seen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import WATERMARK_DEFAULT, with_event_time

# same normalization as operators/dedup.py x1 (the batch-declared twin)
def _fingerprint(text_col) -> "F.Column":
    return F.md5(F.regexp_replace(F.lower(F.trim(text_col)), "[ \\t\\n\\x0B\\f\\r]+", " ").cast("binary"))


def canonical_docs(docs: DataFrame) -> DataFrame:
    """One row per content fingerprint: canonical_id = min doc_id,
    n_copies.  Works identically on batch and streaming input (streaming:
    complete-mode aggregation)."""
    return (
        docs.select(F.col("doc_id"), _fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str | None = WATERMARK_DEFAULT,
) -> DataFrame:
    """Deduplicate an at-least-once event stream by key.

    Semantics, precisely:
    - Streaming: a key's FIRST delivery is emitted; re-deliveries are
      dropped while the key's state lives.  State is evicted once the
      watermark passes the key's event time, so a duplicate arriving
      LATER than the watermark delay is emitted again — the guarantee is
      watermark-bounded, not global.  That bound is what keeps state
      finite on unbounded ingest.
    - Batch: plain dropDuplicates, which keeps an ARBITRARY row per key
      (not necessarily the first by any ordering).  The stream≡batch
      equivalence tests only hold because re-deliveries are byte-identical
      — if payloads of duplicate keys could differ, pick a deterministic
      winner with a min-struct aggregate instead."""
    if events.isStreaming:
        e = with_event_time(events, watermark)
        if watermark:
            return e.dropDuplicatesWithinWatermark(list(keys))
        return e.dropDuplicates(list(keys))
    return events.dropDuplicates(list(keys))
