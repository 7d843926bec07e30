"""Baseline JPEG codec (functions/jpeg.py) — component-level and e2e tests.

Validation strategy without any external codec library:
* the 8x8 DCT is checked against a naive O(N^4) textbook implementation;
* Huffman entropy coding is checked by encoding a known coefficient block
  and decoding it back bit-exactly;
* encode->decode roundtrips bound the reconstruction error on smooth
  images at high quality (quantization error is small there by design);
* the Spark multimodal operators (decode_features / compress_images) run
  the codec inside mapInPandas over image/jpeg rows.
"""

import numpy as np
import pytest

from medical_ocr_service_spark.functions import jpeg as J


def _gradient(w, h, seed=0):
    """Wrap-free smooth gradient: no mod-256 discontinuities, so JPEG's
    ringing at edges can't blow up the max-error bound."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    r = x / max(w - 1, 1) * 255
    g = y / max(h - 1, 1) * 255
    b = (x + y + seed) / max(w + h - 2 + seed, 1) * 255
    return np.stack([r, g, b], axis=-1).round().astype(np.uint8)


def test_dct_matches_naive_and_inverts():
    import math

    rng = np.random.RandomState(7)
    b = rng.randint(0, 256, (4, 8, 8)).astype(np.float64) - 128
    c = J.dct2_blocks(b)

    def naive(x):
        out = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                s = sum(
                    x[i, j]
                    * math.cos((2 * i + 1) * u * math.pi / 16)
                    * math.cos((2 * j + 1) * v * math.pi / 16)
                    for i in range(8)
                    for j in range(8)
                )
                cu = math.sqrt(1 / 8) if u == 0 else 0.5
                cv = math.sqrt(1 / 8) if v == 0 else 0.5
                out[u, v] = cu * cv * s
        return out

    assert np.abs(naive(b[0]) - c[0]).max() < 1e-9
    assert np.abs(J.idct2_blocks(c) - b).max() < 1e-9


def test_huffman_block_roundtrip():
    """Encode one known coefficient block, decode it back bit-exactly —
    exercises DC diff, AC run-lengths, ZRL and EOB."""
    zz = np.zeros(64, np.int64)
    zz[0] = -37  # DC
    zz[1], zz[2], zz[5] = 12, -3, 1
    zz[25] = -1  # 19 zeros before it -> ZRL + run
    dc = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    J._huff_encode_block(bw, zz, 10, dc, ac)  # pred 10 -> diff -47
    data = bw.flush()

    br = J._BitReader(data)
    dcd = J._HuffDecoder(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    acd = J._HuffDecoder(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    out, pred = J._decode_block(br, dcd, acd, 10)
    assert pred == -37
    assert np.array_equal(out, zz)


@pytest.mark.parametrize(
    "quality,subsample,ri",
    [(95, False, 0), (95, True, 0), (90, True, 3), (75, False, 5)],
)
def test_encode_decode_roundtrip(quality, subsample, ri):
    img = _gradient(136, 120, seed=2)
    enc = J.encode_jpeg(img, quality=quality, subsample=subsample, restart_interval=ri)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    w, h, dec = J.decode_jpeg(enc)
    assert (w, h) == (136, 120) and dec.shape == (120, 136, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    # wrap-free smooth gradient at q>=75: error is pure quantization noise
    assert err.mean() < 2.0 and err.max() <= 24


def test_odd_dimensions_and_grayscale():
    img = _gradient(133, 117, seed=4)
    w, h, dec = J.decode_jpeg(J.encode_jpeg(img, quality=92, subsample=True))
    assert (w, h) == (133, 117) and dec.shape == (117, 133, 3)

    g = ((np.mgrid[0:90, 0:110][0] * 2) % 256).astype(np.uint8)
    w, h, dec = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert (w, h) == (110, 90)
    # grayscale expands to identical RGB channels
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).mean() < 2.0


def test_restart_markers_present_and_decoded():
    img = _gradient(80, 48, seed=1)
    enc = J.encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    _, _, dec = J.decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_error_paths():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x89PNG\r\n")
    enc = J.encode_jpeg(_gradient(64, 64), quality=90)
    with pytest.raises(ValueError, match="truncated|missing"):
        J.decode_jpeg(enc[: len(enc) // 2])
    # progressive rejected loudly: flip SOF0 (FFC0) to SOF2 (FFC2)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        J.decode_jpeg(prog)


def test_real_jpeg_features_and_compress(spark):
    from pyspark.sql import functions as F

    from medical_ocr_service_spark.operators import multimodal as mm

    media = mm.synthesize_media(spark, 60)
    jpg = media.filter("mime = 'image/jpeg'")
    assert jpg.count() > 0
    feats = mm.decode_features(jpg, fake=False).toPandas()
    assert feats["valid"].all()
    assert feats["feat"].map(len).eq(16).all()
    assert feats["feat"].map(lambda f: all(0 <= x <= 1 for x in f)).all()

    # lying metadata caught against the decoded raster
    lied = jpg.limit(1).withColumn("height", F.lit(4001))
    out = mm.decode_features(lied, fake=False).toPandas()
    assert not out.iloc[0]["valid"]
    assert out.iloc[0]["error"] == "METADATA_DIMENSION_MISMATCH"

    # compression pass halves an oversized JPEG (possibly repeatedly) and
    # re-encodes real pixels; recorded metadata matches the re-decoded raster
    big = mm.gradient_jpeg(1000, 800, seed=5)
    m2 = spark.createDataFrame(
        [("big", "image", "image/jpeg", big, 1000, 800, None)],
        schema=mm.MEDIA_SCHEMA,
    )
    row = mm.compress_images(m2, max_bytes=len(big) // 3).toPandas().iloc[0]
    assert len(row["payload"]) <= len(big) // 3
    w, h, arr = J.decode_jpeg(bytes(row["payload"]))
    assert (w, h) == (row["width"], row["height"])
    assert w <= 500 and h <= 400 and w >= mm.MIN_DIM and h >= mm.MIN_DIM
    assert arr.shape == (h, w, 3)
