"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas functions via mapInPandas.

The decode step is gated behind an import probe (`HAS_IMAGING`): when an
imaging library is installed `decode_image` is the real PIL decode, when
not (this container) `fake_decode_meta` is the deterministic twin — the
SAME mapInPandas path either way (`extract_image_meta` takes the decoder
as an injectable), and the Spark-side plumbing is real and tested under
both: schema, binary columns, batch shape, NULL/undecodable propagation,
and the Arrow transfer.

Scale design: payloads never enter a shuffle — feature extraction is a
narrow mapInPandas over the scan; only the (small) extracted features move.
At 100 TB you partition by asset shard and keep `payload` out of every
groupBy/join (join on asset_id, fetch payload late).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import read_table
from .relational import _register

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video | text
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("codepoint_sum", T.LongType()),
        T.StructField("n_batch_rows", T.IntegerType()),
    ]
)

_MODALITIES = ("image", "audio", "video", "text")


def synthesize_assets(spark, sf_dir: str) -> DataFrame:
    """Deterministic multimodal asset table derived from `documents`:
    payload = utf-8 bytes of the text (an opaque blob as far as the engine
    is concerned), modality assigned round-robin by doc_id."""
    d = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    modality = F.element_at(F.array(*[F.lit(m) for m in _MODALITIES]), (F.col("doc_id") % 4 + 1).cast("int"))
    return d.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.concat(F.lit("application/x-"), modality).alias("mime"),
        ).alias("meta"),
    )


# optional-dependency probe, ONCE at import: the real decoder exists iff
# an imaging library is installed; everything downstream (schema,
# batching, mapInPandas plumbing) is identical either way
try:
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

HAS_IMAGING = _PILImage is not None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) of a PNG payload via a REAL stdlib decode — no
    imaging library needed: PNG is zlib-compressed scanlines in
    CRC-framed chunks (the same format knowledge plot.py's raster sinks
    encode with), so the meta decode is a signature check + a CRC-verified
    chunk walk + the IHDR header.  Every chunk's CRC is verified, so a
    truncated or bit-flipped payload raises (→ NULL meta through
    extract_image_meta) instead of yielding plausible garbage dims.
    This closes the container's real-decode gap for PNG payloads; other
    formats still need the probed imaging library (decode_image)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, dims, saw_end = 8, None, False
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in PNG chunk {tag!r}")
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            dims = (int(w), int(h))
        if tag == b"IEND":
            saw_end = True
            break
        pos += 12 + ln
    if dims is None:
        raise ValueError("PNG payload has no IHDR chunk")
    if not saw_end:
        raise ValueError("truncated PNG: no IEND chunk")
    return dims


def decode_image(payload: bytes) -> tuple[int, int]:
    """(width, height) of an encoded image: the real imaging library when
    installed; PNG payloads decode for REAL even without one (the stdlib
    chunk walk, decode_png_meta).  Only a non-PNG payload with no library
    raises NotImplementedError, routing callers to fake_decode_meta — the
    SAME mapInPandas path every way (test_multimodal_decode parametrizes
    over fake / stdlib-PNG / PIL, the last skipif on HAS_IMAGING)."""
    if _PILImage is None:
        if payload[:8] == _PNG_SIG:
            return decode_png_meta(payload)
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library not present "
            "in this container"
        )
    import io as _io

    with _PILImage.open(_io.BytesIO(payload)) as im:
        return (int(im.width), int(im.height))


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: fake (width, height) from the
    byte length — keeps the downstream schema and tests real, and gives
    the m5 declared query an engine-portable oracle."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def default_decoder():
    """The decode dispatch: real library when present, deterministic twin
    otherwise.  Resolved at call time (not import) so tests can monkey-
    patch the probe."""
    return decode_image if HAS_IMAGING else fake_decode_meta


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def extract_image_meta(assets: DataFrame, decoder=None) -> DataFrame:
    """Decode → (width, height) over image payloads via mapInPandas — the
    one multimodal path whose kernel depends on an optional library, so
    the decoder is injectable: default_decoder() picks the real decode
    when HAS_IMAGING else the deterministic twin, and the Spark-side
    shape (binary column in, typed meta out, NULL payload → NULL meta,
    undecodable payload → NULL meta instead of a poisoned batch) is
    identical and tested under both.  Payloads never shuffle: the decode
    is scan-side, only (asset_id, width, height) moves."""
    dec = decoder if decoder is not None else default_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = [], []
            for p in pdf["payload"]:
                wh = None
                if p is not None:
                    try:
                        wh = dec(bytes(p))
                    except Exception:
                        wh = None  # undecodable asset -> NULL meta, row survives
                w.append(None if wh is None else wh[0])
                h.append(None if wh is None else wh[1])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                }
            )

    return (
        assets.where(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=IMAGE_META_SCHEMA)
    )


def _segment_batch(payloads):
    """Whole-batch payload segmentation — the vectorized core shared by m2
    and m3.  ONE decode for the entire Arrow batch instead of one per row:
    concatenate payloads, count per-row characters from the UTF-8 start
    bytes ((b & 0xC0) != 0x80) with cumsum arithmetic.  Returns
    (buf, byte_lens, char_counts); all downstream per-row stats are
    differences of prefix sums at the row boundaries."""
    import numpy as np

    n = len(payloads)
    buf = b"".join(payloads)
    byte_lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
    arr8 = np.frombuffer(buf, dtype=np.uint8)
    cum_chars = np.concatenate(([0], np.cumsum((arr8 & 0xC0) != 0x80, dtype=np.int64)))
    bbounds = np.concatenate(([0], np.cumsum(byte_lens)))
    char_counts = cum_chars[bbounds[1:]] - cum_chars[bbounds[:-1]]
    return buf, byte_lens, char_counts


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas.  Emits per-asset byte stats plus the batch size it saw
    (pins down the batch shape in tests).

    Fully vectorized inside the batch (no per-row Python): the batch is
    decoded ONCE, codepoints are one uint32 reinterpretation, and per-row
    sums are prefix-sum differences at the row boundaries.

    A NULL payload (missing asset) yields NULL stats — the row survives so
    ingest QA can count the gap, matching the oracle's NULL propagation
    (pinned by the edge-corpus test).

    Only the columns the kernel touches cross the Python boundary
    (guide §4.1: Spark cannot see inside an opaque function, so an
    unprojected mapInPandas ships — and Arrow-serializes — every input
    column; the r15 plan audit caught the synthesized ``meta`` struct
    riding along and being built per row just to be discarded)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pay = pdf["payload"]
            valid = pay.notna().to_numpy()
            n = len(pdf)
            nb = pd.array([None] * n, dtype="Int32")
            cs = pd.array([None] * n, dtype="Int64")
            if valid.any():
                buf, byte_lens, char_counts = _segment_batch(pay[valid])
                cp = np.frombuffer(
                    buf.decode("utf-8").encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                cpc = np.concatenate(([0], np.cumsum(cp)))
                cbounds = np.concatenate(([0], np.cumsum(char_counts)))
                idx = np.nonzero(valid)[0]
                nb[idx] = byte_lens.astype("int32")
                cs[idx] = cpc[cbounds[1:]] - cpc[cbounds[:-1]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": nb,
                    "codepoint_sum": cs,
                    "n_batch_rows": n,
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        feats, schema=FEATURE_SCHEMA
    )


@_register(
    "m1_asset_meta",
    "Multimodal asset metadata: per-modality asset count, total payload "
    "bytes, payload content hash sample — pure column ops over the binary "
    "column (payload itself never shuffles; only the 3 aggregate columns).",
    """
    WITH assets AS (
      SELECT doc_id AS asset_id,
             (['image','audio','video','text'])[CAST(doc_id % 4 AS INT) + 1] AS modality,
             text AS payload_text
      FROM documents)
    SELECT modality, COUNT(*) AS n_assets,
           -- OCTET_LENGTH(ENCODE(..)) = unambiguous BYTE count, matching
           -- Spark F.length() on the BINARY payload (DuckDB STRLEN is also
           -- bytes, but the spelling here makes the unit explicit)
           CAST(SUM(OCTET_LENGTH(ENCODE(payload_text))) AS BIGINT) AS total_bytes,
           MIN(MD5(payload_text)) AS min_payload_md5
    FROM assets GROUP BY modality ORDER BY modality
    """,
    ("multimodal", "pipeline"),
)
def m1(spark, sf_dir):
    a = synthesize_assets(spark, sf_dir)
    return (
        a.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.min(F.md5("payload")).alias("min_payload_md5"),
        )
        .orderBy("modality")
    )


@_register(
    "m2_feature_extract",
    "Arrow-batched mapInPandas feature extraction over binary payloads "
    "(the UDF scale path: pandas batches, not per-row Python).  Oracle "
    "recomputes the code-point checksum relationally.",
    """
    SELECT doc_id AS asset_id,
           CAST(STRLEN(text) AS INT) AS n_bytes,
           CAST(list_sum(list_transform(string_split_regex(text, ''),
                                        c -> ascii(c))) AS BIGINT) AS codepoint_sum
    FROM documents ORDER BY asset_id
    """,
    ("multimodal", "pandas-udf", "pipeline"),
)
def m2(spark, sf_dir):
    feats = extract_features(synthesize_assets(spark, sf_dir))
    # checkpoint before the global sort: the range sampler would otherwise
    # re-execute the feature mapInPandas a second time (m3's fix)
    return (
        feats.select("asset_id", "n_bytes", "codepoint_sum")
        .localCheckpoint(eager=False)
        .orderBy("asset_id")
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

FRAME_STRIDE = 64  # sample one frame every 64 chars of payload
FRAME_LEN = 32  # keep the first 32 chars of each sampled frame


def sample_frames(assets: DataFrame) -> DataFrame:
    """Frame sampling over video payloads: a 1→N mapInPandas that emits one
    row per sampled frame (every FRAME_STRIDE-th offset, FRAME_LEN chars
    kept — the stand-in for decode→frame-extract→thumbnail, which needs
    codec libs this container lacks).  The Spark-side shape is the real
    thing: Arrow batches in, a different (longer) frame table out, payloads
    never shuffled.  Only (asset_id, payload) crosses the Python boundary
    — the kernel reads nothing else, and an unprojected mapInPandas would
    ship (and per-row build) the modality string and meta struct through
    Arrow just to drop them (guide §4.1; r15 plan audit)."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # Vectorized 1→N expansion: ONE decode per batch, then the
            # frame table (asset repeat, per-asset frame index, offsets,
            # lengths) is pure numpy repeat/arange/cumsum arithmetic.  Only
            # the md5 digests remain Python — hashing is per-frame by
            # nature — as a single comprehension over slices of the one
            # decoded string, no per-frame append loop.
            buf, _byte_lens, char_counts = _segment_batch(pdf["payload"])
            big = buf.decode("utf-8")
            n_frames = np.where(char_counts >= 1, (char_counts - 1) // FRAME_STRIDE + 1, 0)
            total = int(n_frames.sum())
            aid = np.repeat(pdf["asset_id"].to_numpy(np.int64), n_frames)
            grp_start = np.concatenate(([0], np.cumsum(n_frames)))[:-1]
            fidx = np.arange(total, dtype=np.int64) - np.repeat(grp_start, n_frames)
            cstart = np.concatenate(([0], np.cumsum(char_counts)))[:-1]
            off = np.repeat(cstart, n_frames) + fidx * FRAME_STRIDE
            remaining = np.repeat(cstart + char_counts, n_frames) - off
            flen = np.minimum(remaining, FRAME_LEN)
            ends = off + flen
            md5s = [
                hashlib.md5(big[o:e].encode("utf-8")).hexdigest()
                for o, e in zip(off.tolist(), ends.tolist())
            ]
            yield pd.DataFrame(
                {
                    "asset_id": aid,
                    "frame_idx": fidx.astype("int32"),
                    "frame_len": flen.astype("int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(frames, schema=FRAME_SCHEMA)


@_register(
    "m3_frame_sample",
    "Multimodal frame sampling: video assets expand 1→N into a frame table "
    "(every 64th offset, 32-char frame, md5 per frame) via Arrow-batched "
    "mapInPandas.  Oracle recomputes the sampling relationally with "
    "generate_series + SUBSTR.",
    f"""
    WITH v AS (
      SELECT doc_id AS asset_id, text FROM documents
      WHERE doc_id % 4 = 2 AND LEN(text) >= 1),
    f AS (
      SELECT asset_id, text,
             UNNEST(generate_series(0, (LEN(text) - 1) // {FRAME_STRIDE})) AS fi
      FROM v)
    SELECT asset_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(LEN(SUBSTR(text, fi * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS INT) AS frame_len,
           MD5(SUBSTR(text, fi * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_md5
    FROM f ORDER BY asset_id, frame_idx
    """,
    ("multimodal", "pandas-udf", "frame-sample", "pipeline"),
)
def m3(spark, sf_dir):
    video = synthesize_assets(spark, sf_dir).where(
        (F.col("modality") == "video") & (F.length("payload") >= 1)
    )
    # checkpoint before the global sort: the range sampler would otherwise
    # re-execute the whole mapInPandas (Python workers) a second time
    return sample_frames(video).localCheckpoint(eager=False).orderBy("asset_id", "frame_idx")


# ---------------------------------------------------------------------------
# m5: image meta extraction (the optional-dependency decode path)
# ---------------------------------------------------------------------------
@_register(
    "m5_image_meta",
    "Image meta extraction over binary payloads via mapInPandas — the "
    "decode path whose kernel lives behind the optional-dependency probe "
    "(extract_image_meta: real PIL decode when HAS_IMAGING; PNG payloads "
    "decode for REAL even without it via the stdlib chunk-walk "
    "decode_png_meta — CRC-verified, exercised in-container; the "
    "deterministic fake twin covers non-PNG with no library — one "
    "injectable-decoder plumbing every way).  The DECLARED query pins "
    "the fake decoder so the "
    "contract is engine-portable and environment-independent — (width, "
    "height) = (bytes % 640 + 1, bytes % 480 + 1), which the oracle "
    "recomputes relationally; on a real image corpus the real decoder "
    "is the drop-in behind the same schema.  NULL payloads survive as "
    "NULL meta (ingest QA counts the gap).  Scale shape: decode is "
    "scan-side, payload bytes never shuffle, only (asset_id, width, "
    "height) moves.",
    """
    SELECT doc_id AS asset_id,
           CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS width,
           CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INT) AS height
    FROM documents WHERE doc_id % 4 = 0 ORDER BY asset_id
    """,
    ("multimodal", "pandas-udf", "decode", "pipeline"),
)
def m5(spark, sf_dir):
    a = synthesize_assets(spark, sf_dir)
    # checkpoint before the global sort: the range sampler would otherwise
    # re-execute the decode mapInPandas a second time (m3's fix)
    return (
        extract_image_meta(a, decoder=fake_decode_meta)
        .localCheckpoint(eager=False)
        .orderBy("asset_id")
    )


# ---------------------------------------------------------------------------
# m4: cross-asset frame dedup (the multimodal twin of x1 exact dedup)
# ---------------------------------------------------------------------------
@_register(
    "m4_frame_dedup",
    "Cross-asset FRAME dedup: group the m3 frame table by frame hash and "
    "report every hash appearing more than once — shared intros, static "
    "segments, re-uploads.  The multimodal twin of x1: the decode/sample "
    "step (mapInPandas) emits one 32-char hash per frame, and from there "
    "the shuffle carries (frame_md5, asset_id, frame_idx) — never frame "
    "payloads — so dedup cost is independent of frame byte size at "
    "100 TB.  Canonical = (min asset, min idx within that asset).",
    f"""
    WITH v AS (
      SELECT doc_id AS asset_id, text FROM documents
      WHERE doc_id % 4 = 2 AND LEN(text) >= 1),
    f AS (
      SELECT asset_id, text,
             UNNEST(generate_series(0, (LEN(text) - 1) // {FRAME_STRIDE})) AS fi
      FROM v),
    fr AS (
      SELECT asset_id, CAST(fi AS INT) AS frame_idx,
             MD5(SUBSTR(text, fi * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_md5
      FROM f)
    SELECT frame_md5,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets,
           CAST(MIN(asset_id) AS BIGINT) AS first_asset,
           CAST(MIN(CASE WHEN asset_id = m THEN frame_idx END) AS INT) AS first_idx
    FROM (SELECT *, MIN(asset_id) OVER (PARTITION BY frame_md5) AS m FROM fr)
    GROUP BY frame_md5
    HAVING COUNT(*) > 1
    ORDER BY frame_md5
    """,
    ("multimodal", "dedup", "frame-sample", "pipeline"),
)
def m4(spark, sf_dir):
    # NOT session-cached: the frame table's only other producer-consumer
    # relationship is m3, whose RESULT the frame table essentially is —
    # caching here would be a single-consumer memo of m4's own upstream,
    # which the session_index discipline forbids (feeds must be shared).
    video = synthesize_assets(spark, sf_dir).where(
        (F.col("modality") == "video") & (F.length("payload") >= 1)
    )
    fr = sample_frames(video).select("asset_id", "frame_idx", "frame_md5")
    # min (asset, idx) in ONE max-struct-free aggregate: min asset first,
    # then min idx among that asset's rows via a struct-min — map-side
    # combinable, no window over the frame table
    pick = F.min(F.struct(F.col("asset_id"), F.col("frame_idx")))
    return (
        fr.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("asset_id").alias("n_assets"),
            pick.alias("m"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "frame_md5",
            "n_copies",
            "n_assets",
            F.col("m.asset_id").cast("bigint").alias("first_asset"),
            F.col("m.frame_idx").cast("int").alias("first_idx"),
        )
        .orderBy("frame_md5")
    )
