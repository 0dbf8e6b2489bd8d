from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"x" * 5000, ("png", 10, 10, 5000)),
        (2, b"hello world" * 400, ("jpg", 20, 5, 4400)),
        (3, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.mark.smoke
def test_extract_features_deterministic(spark, media):
    out = extract_features(media, decoder="fake")
    rows = {r["media_id"]: r["feature"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3] is None  # null blob → null feature, no crash
    assert len(rows[1]) == FEATURE_DIM
    assert all(0 <= v < 1 for v in rows[1])
    # deterministic across runs
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert rows == rows2
    # schema contract
    assert out.schema["feature"].dataType.simpleString() == "array<float>"


def test_real_decoder_is_explicit_stub(spark, media):
    out = extract_features(media, decoder="real")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def test_unknown_decoder_rejected(media):
    with pytest.raises(ValueError):
        extract_features(media, decoder="nope")


def test_frame_sample_chunking(spark, media):
    frames = frame_sample(media, frame_bytes=1024, stride=2)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("frame_no").alias("first"),
    )
    by_id = {r["media_id"]: (r["n"], r["first"]) for r in got.collect()}
    # blob 1: 5000 bytes → 5 chunks → frames 0,2,4 → 3 sampled
    assert by_id[1] == (3, 0)
    # blob 2: 4400 bytes → 5 chunks → 3 sampled
    assert by_id[2] == (3, 0)
    assert 3 not in by_id  # null blob skipped
    sizes = {
        (r["media_id"], r["frame_no"]): len(r["frame"]) for r in frames.collect()
    }
    assert sizes[(1, 0)] == 1024 and sizes[(1, 4)] == 904  # tail chunk


def test_audio_pcm_stats_matches_numpy(spark):
    """The PCM16 decode is REAL: stats must equal a local numpy
    reference, including odd-trailing-byte truncation and empty blobs."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import audio_pcm_stats

    blobs = {
        1: bytes(range(16)),          # even length
        2: bytes(range(15)),          # odd -> last byte ignored
        3: b"",                        # empty -> null stats
        4: (32767).to_bytes(2, "little") + (32768).to_bytes(2, "little"),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    for k, b in blobs.items():
        v = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
        assert got[k].n_samples == len(v)
        if len(v):
            x = v.astype(np.float64)
            assert got[k].rms == round(float(np.sqrt((x * x).sum() / len(v))), 6)
            assert got[k].peak == int(np.abs(v.astype(np.int64)).max())
        else:
            assert got[k].rms is None and got[k].peak is None
    assert got[4].peak == 32768  # -32768 interpreted signed, |.| kept


def test_resize_images_contract(spark):
    """Fake resize: deterministic bytes of exactly width*height, meta
    updated, nulls passed through, real decoder raises at the seam."""
    import pytest

    from datalakeingestion_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"img-bytes")), (2, None)],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in resize_images(df, 8, 4).collect()}
    assert len(out[1].content) == 32
    assert out[1].meta.width == 8 and out[1].meta.height == 4
    assert out[2].content is None
    again = {r.media_id: r for r in resize_images(df, 8, 4).collect()}
    assert bytes(again[1].content) == bytes(out[1].content)
    with pytest.raises(Exception, match="codec"):
        resize_images(df, 8, 4, decoder="real").collect()

# ---------------------------------------------------------------------------
# REAL codec-free image decode (NetPBM P5/P6, BMP24)
# ---------------------------------------------------------------------------


def _ppm(w, h, pixel_bytes):
    return b"P6\n%d %d\n255\n" % (w, h) + pixel_bytes


def _bmp24(pixels_rgb):
    """Hand-assemble a bottom-up 24-bit BI_RGB BMP from (H,W,3) uint8."""
    import numpy as np

    h, w, _ = pixels_rgb.shape
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for row in pixels_rgb[::-1]:  # bottom-up storage
        line = bytearray(row[:, ::-1].tobytes())  # RGB -> BGR
        line += b"\x00" * (stride - len(line))
        raster += line
    data_off = 14 + 40
    file_size = data_off + len(raster)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(raster)


def test_decode_image_ppm_pgm_bmp():
    import numpy as np
    import pytest

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    fmt, w, h, got = decode_image(_ppm(3, 5, px.tobytes()))
    assert (fmt, w, h) == ("ppm", 3, 5)
    assert np.array_equal(got, px)
    # round-trip through the encoder
    assert decode_image(encode_ppm(px))[3].tolist() == px.tolist()
    # header comments + arbitrary whitespace are part of the spec
    commented = b"P6 # comment\n# another\n 3\t5 # dims\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(commented)[3], px)
    # PGM grayscale replicates across channels
    gray = rng.integers(0, 256, size=(4, 2), dtype=np.uint8)
    fmt, w, h, got = decode_image(b"P5\n2 4\n255\n" + gray.tobytes())
    assert fmt == "pgm" and got.shape == (4, 2, 3)
    assert np.array_equal(got[:, :, 0], gray)
    assert np.array_equal(got[:, :, 1], gray)
    # BMP24 exact pixels incl. row padding (w=3 -> stride 12, 3 pad bytes)
    bmp_px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    fmt, w, h, got = decode_image(_bmp24(bmp_px))
    assert (fmt, w, h) == ("bmp", 3, 2)
    assert np.array_equal(got, bmp_px)
    # corrupt -> ValueError; unknown -> NotImplementedError; None -> None
    with pytest.raises(ValueError, match="truncated"):
        decode_image(_ppm(3, 5, px.tobytes()[:-1]))
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    assert decode_image(None) is None


def test_image_stats_real_decode(spark):
    """image_stats over real PPM/BMP blobs matches a numpy reference;
    corrupt and compressed blobs quarantine into decode_error rows."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import image_stats

    rng = np.random.default_rng(11)
    p1 = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    p2 = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(_ppm(6, 4, p1.tobytes()))),
        (2, bytearray(_bmp24(p2))),
        (3, bytearray(b"\x89PNG compressed")),
        (4, bytearray(_ppm(9, 9, b"short"))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in image_stats(df).collect()}
    for mid, px, fmt in ((1, p1, "ppm"), (2, p2, "bmp")):
        r = got[mid]
        s = px.astype(np.int64).sum(axis=(0, 1))
        n = px.shape[0] * px.shape[1]
        assert (r.format, r.width, r.height, r.n_pixels) == (
            fmt, px.shape[1], px.shape[0], n,
        )
        # half-UP 6-dp rounding (SQL ROUND semantics, not Python's
        # ties-to-even), exact in integer math
        exp = tuple(((int(v) * 2_000_000 + n) // (2 * n)) / 1e6 for v in s)
        assert (r.mean_r, r.mean_g, r.mean_b) == exp
        assert r.decode_error is None
    assert got[3].decode_error == "NotImplementedError"
    assert got[4].decode_error == "ValueError"
    assert got[3].n_pixels is None
    # null blob keeps its row (quarantine contract, same as
    # extract_features/resize_images)
    assert got[5].decode_error == "NullContent" and got[5].n_pixels is None


def test_resize_images_real_nearest_neighbor(spark):
    """Real resize: decode -> integer-grid nearest neighbor -> PPM
    re-encode, verified against the same grid computed locally."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        resize_images,
    )

    rng = np.random.default_rng(13)
    src = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(8, 6, src.tobytes())))],
        "media_id long, content binary",
    )
    [r] = resize_images(df, width=4, height=3, decoder="real").collect()
    assert (r.meta.format, r.meta.width, r.meta.height) == ("ppm", 4, 3)
    fmt, w, h, got = decode_image(bytes(r.content))
    assert (fmt, w, h) == ("ppm", 4, 3)
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(got, src[ys][:, xs])


def test_extract_features_real_pixels(spark):
    """decoder='real' features come from decoded pixels (not byte
    hashes): a constant-color image yields its exact channel means."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import extract_features

    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(8, 4, px.tobytes()))), (2, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r.feature for r in extract_features(df, "real").collect()}
    f = rows[1]
    assert rows[2] is None
    # values are 6-dp rounded then stored as float32
    assert f[:2] == pytest.approx(
        [round(8 / 4096, 6), round(4 / 4096, 6)], abs=1e-6
    )
    assert f[2:5] == pytest.approx([1.0, 0.0, 0.0], abs=1e-6)  # mean RGB
    assert f[5] == pytest.approx(round(1 / 3, 6), abs=1e-6)    # mean luma
    assert f[7] == pytest.approx(2.0, abs=1e-6)                # aspect


def test_image_stats_zero_area_quarantined(spark):
    """A zero-dimension header (w or h = 0) is a corrupt file, not a
    crash: decode_image raises ValueError and image_stats quarantines
    the row instead of dying on ZeroDivision inside the mean."""
    import pytest as _pytest

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        image_stats,
    )

    with _pytest.raises(ValueError, match="degenerate"):
        decode_image(b"P6\n0 5\n255\n")
    with _pytest.raises(ValueError, match="degenerate"):
        decode_image(b"P6\n5 0\n255\n")
    df = spark.createDataFrame(
        [(1, bytearray(b"P6\n0 5\n255\n"))], "media_id long, content binary"
    )
    [r] = image_stats(df).collect()
    assert r.decode_error == "ValueError" and r.n_pixels is None


def test_image_stats_null_content_preserved(spark):
    """A NULL content blob keeps its row (null stats + 'NullContent')
    like extract_features/resize_images do — dropping it would silently
    lose the media_id from downstream joins."""
    from datalakeingestion_spark.operators.multimodal import image_stats

    df = spark.createDataFrame(
        [(7, None), (8, bytearray(b"P6\n1 1\n255\nABC"))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in image_stats(df).collect()}
    assert set(rows) == {7, 8}
    assert rows[7].decode_error == "NullContent"
    assert rows[7].n_pixels is None and rows[7].format is None
    assert rows[8].decode_error is None and rows[8].n_pixels == 1


def test_video_avi_roundtrip_and_stats(spark):
    """encode_avi_rgb24 -> decode_video is bit-exact; video_stats
    matches a numpy reference (HALF-UP 6-dp channel means over all
    frames); corrupt/compressed/null blobs quarantine with the error
    class, never dropping the media_id."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_video,
        encode_avi_rgb24,
        video_stats,
    )

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    blob = encode_avi_rgb24(frames, 33_333)
    fmt, w, h, micros, out = decode_video(blob)
    assert (fmt, w, h, micros, len(out)) == ("avi", 5, 3, 33_333, 4)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))

    compressed = bytearray(blob)
    # flip biCompression in strf to a nonzero codec id
    strf_at = blob.index(b"strf")
    compressed[strf_at + 8 + 16 : strf_at + 8 + 20] = (1).to_bytes(
        4, "little"
    )
    rows = [
        (1, bytearray(blob)),
        (2, bytearray(b"RIFF\x04\x00\x00\x00AVI ")),  # no header/frames
        (3, bytearray(b"\x00\x01\x02 not a riff")),
        (4, None),
        (5, compressed),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in video_stats(df).collect()}
    st = np.stack(frames).astype(np.int64)
    n = 4 * 5 * 3
    exp = [
        ((int(st[..., c].sum()) * 2_000_000 + n) // (2 * n)) / 1e6
        for c in range(3)
    ]
    r1 = got[1]
    assert (r1.format, r1.width, r1.height, r1.n_frames) == ("avi", 5, 3, 4)
    assert (r1.micros_per_frame, r1.n_pixels) == (33_333, n)
    assert (r1.mean_r, r1.mean_g, r1.mean_b) == tuple(exp)
    assert got[2].decode_error == "ValueError"
    assert got[3].decode_error == "NotImplementedError"
    assert got[4].decode_error == "NullContent" and got[4].width is None
    assert got[5].decode_error == "NotImplementedError"


def test_video_avi_with_audio_stream_still_decodes():
    """A standard AVI carries a video strl FOLLOWED by an audio strl;
    the audio stream's WAVEFORMATEX (wBitsPerSample=16 at the same
    offset the bitmap header keeps biBitCount) must not be misread as
    the video format — strf parsing binds to the first 'vids' strl."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_video,
        encode_avi_rgb24,
    )

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(2, 4, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    blob = encode_avi_rgb24(frames, 40_000)

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u16(v):
        return int(v).to_bytes(2, "little")

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + u32(len(payload)) + payload + pad

    # audio strl: strh fccType 'auds', strf = PCM WAVEFORMATEX with
    # wBitsPerSample=16 exactly where a bitmap header keeps biBitCount
    strh_a = b"auds" + b"\x00" * 4 + u32(0) * 11
    strf_a = (
        u16(1) + u16(2) + u32(44_100) + u32(176_400) + u16(4) + u16(16)
        + u16(0)
    )
    strl_a = chunk(
        b"LIST", b"strl" + chunk(b"strh", strh_a) + chunk(b"strf", strf_a)
    )

    # splice the audio strl into hdrl after the video strl, fixing the
    # hdrl LIST size and the outer RIFF size
    hdrl_at = blob.index(b"hdrl") - 8  # LIST header start
    hdrl_size = int.from_bytes(blob[hdrl_at + 4 : hdrl_at + 8], "little")
    hdrl_end = hdrl_at + 8 + hdrl_size
    two_stream = (
        blob[:hdrl_at + 4]
        + u32(hdrl_size + len(strl_a))
        + blob[hdrl_at + 8 : hdrl_end]
        + strl_a
        + blob[hdrl_end:]
    )
    two_stream = (
        two_stream[:4] + u32(len(two_stream) - 8) + two_stream[8:]
    )

    fmt, w, h, micros, out = decode_video(two_stream)
    assert (fmt, w, h, micros, len(out)) == ("avi", 4, 2, 40_000, 2)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_sample_video_frames_real_decode(spark):
    """Every stride-th REAL frame comes back as a decodable PPM whose
    pixels equal the source frame; undecodable blobs yield no frames."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        encode_avi_rgb24,
        sample_video_frames,
    )

    rng = np.random.default_rng(6)
    frames = [
        rng.integers(0, 256, size=(2, 4, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    rows = [
        (1, bytearray(encode_avi_rgb24(frames))),
        (2, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r.media_id, r.frame_no): bytes(r.frame)
        for r in sample_video_frames(df, stride=2).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (1, 4)}
    for no in (0, 2, 4):
        fmt, w, h, px = decode_image(got[(1, no)])
        assert (fmt, w, h) == ("ppm", 4, 2)
        assert np.array_equal(px, frames[no])


def test_codec_seam_gated_on_optional_packages():
    """The compressed-format seam mirrors the avro gating: WITH PIL/av
    installed the blob decodes to the same output contract; WITHOUT
    them (this container) the pure parser's quarantine class stands.
    Each half runs only in its environment — together they pin that
    package presence changes capability, never the contract."""
    import importlib.util

    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        decode_video,
    )

    has_pil = importlib.util.find_spec("PIL") is not None
    has_av = importlib.util.find_spec("av") is not None

    if has_pil:
        import io

        from PIL import Image

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="PNG")
        fmt, w, h, out = decode_image(buf.getvalue())
        assert (fmt, w, h) == ("png", 6, 4)
        assert np.array_equal(out, px)  # PNG is lossless
    else:
        # PNG magic, structurally plausible, no codec → quarantine seam
        fake_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
        with pytest.raises(NotImplementedError):
            decode_image(fake_png)

    if not has_av:
        with pytest.raises(NotImplementedError):
            decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)

    # in EVERY environment: corrupt-but-recognized stays ValueError and
    # the uncompressed pure paths still decode — the gate adds, never
    # changes
    from datalakeingestion_spark.operators.multimodal import (
        encode_avi_rgb24,
    )

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    blob = encode_avi_rgb24(frames)
    assert decode_video(blob)[0] == "avi"
    with pytest.raises(ValueError):
        decode_video(blob[:40])
