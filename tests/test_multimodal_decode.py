"""Optional-dependency decode paths: extract_image_meta must run the SAME
mapInPandas plumbing whether the decoder is the real imaging library
(HAS_IMAGING) or the deterministic fake twin — parametrized over both,
with the real path skipped where the library is absent (this container).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fifteenmc_spark.operators import multimodal as M


@pytest.mark.parametrize("path", ["fake", "real"])
def test_image_meta_decode_paths(spark, sf_small, path):
    if path == "real" and not M.HAS_IMAGING:
        pytest.skip("no imaging library in this container — fake twin covers the plumbing")
    if path == "fake":
        assets = M.synthesize_assets(spark, sf_small)
        got = {
            r.asset_id: (r.width, r.height)
            for r in M.extract_image_meta(assets, decoder=M.fake_decode_meta)
            .limit(50)
            .collect()
        }
        pay = {
            r.asset_id: bytes(r.payload)
            for r in assets.where(F.col("modality") == "image")
            .select("asset_id", "payload")
            .limit(50)
            .collect()
        }
        assert got and all(
            got[a] == M.fake_decode_meta(p) for a, p in pay.items() if a in got
        )
    else:
        # synthesize REAL encoded images with the library itself, then the
        # real decoder must recover the exact dimensions through the same
        # mapInPandas path
        import io as _io

        from PIL import Image

        rows = []
        for aid, (w, h) in enumerate([(3, 5), (64, 48), (1, 1)]):
            buf = _io.BytesIO()
            Image.new("RGB", (w, h)).save(buf, format="PNG")
            rows.append((aid, "image", bytearray(buf.getvalue()), (len(buf.getvalue()), "image/png")))
        assets = spark.createDataFrame(rows, schema=M.ASSET_SCHEMA)
        got = {
            r.asset_id: (r.width, r.height)
            for r in M.extract_image_meta(assets, decoder=M.decode_image).collect()
        }
        assert got == {0: (3, 5), 1: (64, 48), 2: (1, 1)}


def test_image_meta_null_and_undecodable_payloads(spark):
    # NULL payload and a payload the decoder rejects both yield NULL meta
    # and SURVIVE — ingest QA counts the gap instead of losing the row or
    # poisoning the Arrow batch
    def picky(p: bytes):
        if p == b"bad":
            raise ValueError("undecodable")
        return (7, 9)

    rows = [
        (0, "image", bytearray(b"ok"), (2, "x")),
        (1, "image", None, (None, None)),
        (2, "image", bytearray(b"bad"), (3, "x")),
    ]
    assets = spark.createDataFrame(rows, schema=M.ASSET_SCHEMA)
    got = {
        r.asset_id: (r.width, r.height)
        for r in M.extract_image_meta(assets, decoder=picky).collect()
    }
    assert got == {0: (7, 9), 1: (None, None), 2: (None, None)}


def test_default_decoder_matches_probe():
    dec = M.default_decoder()
    assert dec is (M.decode_image if M.HAS_IMAGING else M.fake_decode_meta)
    if not M.HAS_IMAGING:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG")
