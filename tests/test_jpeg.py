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
    # unsupported coding processes rejected loudly
    with pytest.raises(ValueError, match="arithmetic"):
        J.decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xca", 1))
    with pytest.raises(ValueError, match="hierarchical|lossless"):
        J.decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # a baseline stream mislabeled SOF2 carries an Se=63 "DC" scan: caught
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        J.decode_jpeg(prog)


# ---------------------------------------------------------------------------
# Progressive (SOF2) — round 4: spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _structured(w, h, gray=False, seed=0):
    """Gradient + flat patches + a noise strip: flat regions drive long EOB
    runs (EOBn > 1 path), noise drives dense refinement bits, the gradient
    everything in between."""
    img = _gradient(w, h, seed)
    img[h // 4 : h // 2, w // 4 : w // 2] = [200, 30, 90]
    rng = np.random.default_rng(seed)
    img[: max(h // 8, 1)] = rng.integers(0, 256, (max(h // 8, 1), w, 3), dtype=np.uint8)
    return img[..., 0].copy() if gray else img


@pytest.mark.parametrize(
    "w,h,gray,subsample,quality,ri",
    [
        (64, 64, False, False, 90, 0),
        (64, 64, False, True, 75, 0),
        (53, 37, False, False, 85, 0),
        (53, 37, False, True, 85, 0),   # odd dims + 4:2:0 MCU padding
        (40, 40, True, False, 90, 0),
        (9, 17, True, False, 50, 0),
        (48, 64, False, True, 90, 5),   # restarts inside progressive scans
        (71, 33, True, False, 70, 3),
    ],
)
def test_progressive_decode_equals_baseline(w, h, gray, subsample, quality, ri):
    """A COMPLETE progression transmits every coefficient bit, so the
    progressive decode must be pixel-IDENTICAL to the baseline decode of
    the same image at the same quality (same coefficients -> same IDCT).
    The libjpeg-style script exercises every Annex-G procedure: DC
    first/refine, AC first with EOB runs + ZRL, AC refine with buffered
    correction bits, restarts."""
    img = _structured(w, h, gray=gray, seed=3)
    base = J.encode_jpeg(img, quality=quality, subsample=subsample)
    prog = J.encode_jpeg_progressive(
        img, quality=quality, subsample=subsample, restart_interval=ri
    )
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
    assert prog.count(b"\xff\xda") > base.count(b"\xff\xda")  # multi-scan
    wb, hb, db = J.decode_jpeg(base)
    wp, hp, dp = J.decode_jpeg(prog)
    assert (wb, hb) == (wp, hp) == (w, h)
    assert np.array_equal(db, dp)


def test_progressive_partial_scans_decode_coarse():
    """Spec property: a progressive stream truncated at a scan boundary
    still decodes (coarser image) — the whole point of the progression.
    Cut after the 2nd SOS's entropy (before the 3rd scan) and decode."""
    img = _structured(64, 64, seed=5)
    prog = J.encode_jpeg_progressive(img, quality=90)
    # position of the 3rd SOS marker = end of scan 2's entropy
    third = -1
    for _ in range(3):
        third = prog.find(b"\xff\xda", third + 1)
    truncated = prog[:third] + b"\xff\xd9"
    w, h, coarse = J.decode_jpeg(truncated)
    assert (w, h) == (64, 64)
    w2, h2, full = J.decode_jpeg(prog)
    # coarse != full (later scans add detail) but correlated (same DC)
    assert not np.array_equal(coarse, full)
    assert np.abs(coarse.astype(int) - full.astype(int)).mean() < 40.0


def test_progressive_eobrun_gt_one_exercised():
    """A large flat image guarantees EOB runs > 1 (the EOBn + extension
    bits path on both sides): assert the encoded stream contains an EOBn
    symbol with r >= 1 by decoding correctly AND being much smaller than
    one EOB0 per block would allow."""
    img = np.full((128, 128, 3), 77, np.uint8)
    prog = J.encode_jpeg_progressive(img, quality=90)
    w, h, dec = J.decode_jpeg(prog)
    base = J.encode_jpeg(img, quality=90)
    _, _, db = J.decode_jpeg(base)
    assert np.array_equal(dec, db)
    assert np.abs(dec.astype(int) - 77).max() <= 1


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


# ---------------------------------------------------------------------------
# CMYK / YCCK / stored-RGB / 12-bit parity paths (round 4: the remaining
# sharp-intake stream shapes — image.service.js:186-240 accepts any JPEG
# libjpeg opens, so the decoder must too)
# ---------------------------------------------------------------------------

def _cmyk_gradient(w, h):
    """Smooth 4-channel ink image; K kept mid-range so the CMYK->RGB product
    term stays sensitive to both factors."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    c = x / max(w - 1, 1) * 200
    m = y / max(h - 1, 1) * 200
    yel = (x + y) / max(w + h - 2, 1) * 180
    k = 40 + (x - y + h) / max(w + h - 2, 1) * 60
    return np.stack([c, m, yel, k], axis=-1).round().astype(np.uint8)


def _cmyk_expected_rgb(cmyk):
    s = 255.0 - cmyk.astype(np.float64)  # Adobe-inverted stored values
    return np.clip((s[..., :3] * s[..., 3:] / 255.0).round(), 0, 255)


@pytest.mark.parametrize("transform", [0, 2])
def test_cmyk_roundtrip(transform):
    cmyk = _cmyk_gradient(77, 53)
    enc = J.encode_jpeg_cmyk(cmyk, quality=92, transform=transform)
    assert b"Adobe" in enc[:64]
    w, h, dec = J.decode_jpeg(enc)
    assert (w, h) == (77, 53) and dec.shape == (53, 77, 3)
    err = np.abs(dec.astype(float) - _cmyk_expected_rgb(cmyk))
    assert err.mean() < 3.0 and err.max() <= 40


def test_cmyk_without_adobe_marker_is_plain_cmyk():
    """Strip APP14: the decoder must fall back to the non-inverted CMYK
    convention, i.e. interpret the stored samples as ink directly."""
    cmyk = _cmyk_gradient(40, 32)
    enc = J.encode_jpeg_cmyk(cmyk, quality=92, transform=0)
    i = enc.index(b"\xff\xee")
    (seg_len,) = __import__("struct").unpack_from(">H", enc, i + 2)
    stripped = enc[:i] + enc[i + 2 + seg_len:]
    w, h, dec = J.decode_jpeg(stripped)
    # stored = 255-ink; the no-marker branch re-inverts (treats stored as
    # plain ink), so the expected RGB uses the ORIGINAL ink as Adobe-stored
    ink = cmyk.astype(np.float64)
    expected = np.clip((ink[..., :3] * ink[..., 3:] / 255.0).round(), 0, 255)
    err = np.abs(dec.astype(float) - expected)
    assert err.mean() < 3.0


def test_adobe_rgb_stored_3component():
    """Adobe APP14 transform 0 with 3 components = RGB stored directly
    (no YCbCr transform) — decoded without color conversion."""
    img = _gradient(64, 48, seed=3)
    planes = [img[..., i].astype(np.float64) for i in range(3)]
    enc = J._encode_planes_baseline(planes, [0, 0, 0], quality=92, adobe_transform=0)
    w, h, dec = J.decode_jpeg(enc)
    assert (w, h) == (64, 48)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 24


def test_12bit_gray_roundtrip():
    y, x = np.mgrid[0:60, 0:90].astype(np.float64)
    g16 = ((x + y) / (60 + 90 - 2) * 4095).round().astype(np.uint16)
    enc = J.encode_jpeg_12bit(g16, quality=90)
    # SOF precision byte says 12
    i = enc.index(b"\xff\xc0")
    assert enc[i + 4] == 12
    w, h, dec = J.decode_jpeg(enc)
    assert (w, h) == (90, 60) and dec.shape == (60, 90, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    expected = (g16.astype(np.float64) * 255.0 / 4095.0)
    err = np.abs(dec[..., 0].astype(float) - expected)
    assert err.mean() < 2.0 and err.max() <= 24


def test_12bit_rgb_roundtrip():
    img8 = _gradient(70, 44, seed=6)
    img16 = (img8.astype(np.uint16) * 16)  # 0..4080 in the 12-bit domain
    enc = J.encode_jpeg_12bit(img16, quality=90)
    w, h, dec = J.decode_jpeg(enc)
    assert (w, h) == (70, 44)
    expected = img16.astype(np.float64) * 255.0 / 4095.0
    err = np.abs(dec.astype(float) - expected)
    assert err.mean() < 2.5 and err.max() <= 30


def test_jpeg_rejects_bad_component_counts_and_precision():
    enc = J.encode_jpeg(_gradient(32, 32), quality=90)
    i = enc.index(b"\xff\xc0")
    # precision byte patched to 10 (offset: marker+2len+1)
    bad_prec = enc[: i + 4] + bytes([10]) + enc[i + 5 :]
    with pytest.raises(ValueError, match="precision"):
        J.decode_jpeg(bad_prec)
    with pytest.raises(ValueError, match="HxWx4"):
        J.encode_jpeg_cmyk(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="transform"):
        J.encode_jpeg_cmyk(np.zeros((8, 8, 4), np.uint8), transform=1)
