"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; transforms
run as Arrow-batched ``mapInPandas`` operators so the bytes never leave the
executors and never pass through row-at-a-time Python.

Compressed codecs (JPEG/PNG via PIL, video/audio via ffmpeg) are NOT in
this environment, so those paths stay stubbed: ``decoder="fake"`` derives
small deterministic feature vectors from the bytes' md5 (so schema/
partitioning/batch-shape — the Spark-side contract — is fully real and
tested). ``decoder="real"`` IS real for the uncompressed formats a
pure-numpy decode can handle — NetPBM P5/P6 (PGM/PPM), 24-bit
uncompressed BMP (``decode_image``), PCM16 WAV-less audio, and
uncompressed AVI video (``decode_video``: RIFF walk, 24-bit BI_RGB
'00db' DIB frames) — and raises ``NotImplementedError`` only when
handed a format that genuinely needs an external codec.

Scale notes: one media row can be MBs — ``mapInPandas`` streams Arrow
batches, so executor memory is bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` (set lower for large blobs); feature extraction is
embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(blob: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a decode→embed kernel: FEATURE_DIM floats
    in [0,1) from the md5 of the bytes."""
    if blob is None:
        return None
    digest = hashlib.md5(bytes(blob)).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def decode_image(blob: bytes | None):
    """REAL image decode for the uncompressed formats a pure-numpy parser
    can handle — no external codec needed:

    - NetPBM binary: ``P6`` (PPM, RGB) and ``P5`` (PGM, grayscale),
      including header comments and maxval <= 255;
    - BMP: 24-bit uncompressed (``BI_RGB``) BITMAPINFOHEADER files,
      bottom-up or top-down, with the standard 4-byte row padding.

    Returns ``(fmt, width, height, pixels)`` with ``pixels`` an
    (H, W, 3) uint8 RGB array (grayscale replicated across channels),
    or ``None`` for a null blob. Raises ``NotImplementedError`` for any
    other format — unless PIL is importable, in which case the
    package-gated codec seam (:func:`_pil_decode`, mirroring the avro
    gating in sources/files.py) decodes compressed formats to the SAME
    output contract, so the quarantine path is optional rather than
    terminal. Raises ``ValueError`` for a recognized-but-truncated/
    corrupt file (a real pipeline routes those to a quarantine sink,
    not the codec seam).
    """
    if blob is None:
        return None
    b = bytes(blob)
    try:
        return _decode_image_pure(b)
    except NotImplementedError:
        decoded = _pil_decode(b)
        if decoded is not None:
            return decoded
        raise


def _pil_decode(b: bytes):
    """OPTIONAL real-codec seam: when PIL ships (clusters), compressed
    formats (JPEG/PNG/...) decode to the same (fmt, w, h, RGB uint8)
    tuple; when it doesn't (this container), return None so the pure
    parser's NotImplementedError quarantine stands. PIL failures on
    corrupt input also return None — the quarantine class a blob gets
    must not depend on which packages happen to be installed."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    import numpy as np

    try:
        with Image.open(io.BytesIO(b)) as img:
            fmt = (img.format or "unknown").lower()
            px = np.asarray(img.convert("RGB"), dtype=np.uint8)
            return (fmt, px.shape[1], px.shape[0], px)
    except Exception:
        return None


def _decode_image_pure(b: bytes):
    """Pure-parser branch of :func:`decode_image` (NetPBM + 24-bit
    BMP); raises NotImplementedError at the codec seam."""
    import numpy as np

    if b[:2] in (b"P6", b"P5"):
        fmt = "ppm" if b[:2] == b"P6" else "pgm"
        # header = magic + 3 ints separated by whitespace/comments, then
        # exactly ONE whitespace byte before the raster
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if pos < len(b) and b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(b) and b[pos : pos + 1].isdigit():
                pos += 1
            if start == pos:
                raise ValueError(f"bad {fmt} header")
            fields.append(int(b[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit NetPBM needs a codec")
        if w <= 0 or h <= 0:
            raise ValueError(f"degenerate {fmt} dimensions {w}x{h}")
        nch = 3 if fmt == "ppm" else 1
        need = w * h * nch
        raster = b[pos : pos + need]
        if len(raster) != need:
            raise ValueError(f"truncated {fmt}: {len(raster)}/{need} bytes")
        px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, nch)
        if nch == 1:
            px = np.repeat(px, 3, axis=2)
        return (fmt, w, h, px)
    if b[:2] == b"BM":
        if len(b) < 54:
            raise ValueError("truncated BMP header")
        data_off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        compression = int.from_bytes(b[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={compression} needs a codec "
                "(only 24-bit BI_RGB is decodable without one)"
            )
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0:
            raise ValueError(f"degenerate BMP dimensions {w}x{h}")
        stride = (w * 3 + 3) // 4 * 4
        need = stride * h
        raster = b[data_off : data_off + need]
        if len(raster) != need:
            raise ValueError(f"truncated BMP: {len(raster)}/{need} bytes")
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        if not top_down:
            px = px[::-1]
        return ("bmp", w, h, np.ascontiguousarray(px))
    raise NotImplementedError(
        "unrecognized image format (only P5/P6 NetPBM and 24-bit BMP "
        "decode codec-free) — plug PIL/opencv in here"
    )


def _real_features(blob: bytes | None) -> list[float] | None:
    """Decode → FEATURE_DIM-float descriptor, all derived from the real
    pixel array: dimensions, per-channel means, luma dispersion, aspect.
    Deterministic (exact integer sums in float64 before the rounding)."""
    import numpy as np

    decoded = decode_image(blob)
    if decoded is None:
        return None
    _, w, h, px = decoded
    x = px.astype(np.float64)
    mean_rgb = x.mean(axis=(0, 1)) / 255.0
    luma = x.mean(axis=2) / 255.0
    return [
        round(float(v), 6)
        for v in (
            w / 4096.0,
            h / 4096.0,
            mean_rgb[0],
            mean_rgb[1],
            mean_rgb[2],
            float(luma.mean()),
            float(luma.std()),
            w / max(h, 1),
        )
    ]


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_size_hint: int | None = None
) -> DataFrame:
    """(media_id, feature: array<float>) via Arrow-batched mapInPandas.

    ``decoder="real"`` decodes each blob with :func:`decode_image`
    (NetPBM/BMP24, codec-free) and emits an 8-dim pixel-derived
    descriptor; unsupported formats raise at the codec seam."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    kernel = _real_features if decoder == "real" else _fake_features

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": pdf["content"].map(kernel),
                }
            )

    return media.select("media_id", "content").mapInPandas(op, _FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, frame_bytes: int = 1024, stride: int = 4
) -> DataFrame:
    """Deterministic byte-level frame sampler: every ``stride``-th
    ``frame_bytes`` chunk of the blob becomes a frame row
    (media_id, frame_no, frame: binary) — the raw-blob fallback for
    formats without a codec. For uncompressed AVI the codec-backed
    :func:`sample_video_frames` decodes REAL frames instead."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                blob = bytes(blob)
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for frame_no in range(0, n_frames, stride):
                    lo = frame_no * frame_bytes
                    out_ids.append(mid)
                    out_nos.append(frame_no)
                    out_frames.append(blob[lo : lo + frame_bytes])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def encode_avi_rgb24(frames, micros_per_frame: int = 40_000) -> bytes:
    """Minimal uncompressed AVI writer (RIFF / 'vids' 'DIB ' stream,
    24-bit BI_RGB '00db' frames, bottom-up rows, 4-byte row padding) —
    the container twin of :func:`decode_video`, used by tests and by
    in-plan blob packaging the same way the PPM re-encoder is."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("frames must be (H, W, 3) arrays")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one geometry")
    stride = (w * 3 + 3) // 4 * 4

    def u32(v):
        return int(v).to_bytes(4, "little")

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + u32(len(payload)) + payload + pad

    def dib(frame):
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = frame[y, :, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        return b"".join(rows)

    avih = (
        u32(micros_per_frame) + u32(0) + u32(0) + u32(0)
        + u32(len(frames)) + u32(0) + u32(1) + u32(0)
        + u32(w) + u32(h) + u32(0) * 4
    )
    strh = (
        b"vids" + b"DIB " + u32(0) + u32(0) + u32(0)
        + u32(micros_per_frame) + u32(1_000_000) + u32(0)
        + u32(len(frames)) + u32(0) + u32(0) + u32(0)
        + u32(0) + u32(0)
    )
    strf = (
        u32(40) + u32(w) + u32(h)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + u32(0) + u32(stride * h) + u32(0) * 4
    )
    strl = chunk(
        b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00db", dib(f)) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(body)) + body


def decode_video(blob: bytes | None):
    """REAL video decode for the one container/codec combination a pure
    parser can handle — uncompressed AVI ('00db' DIB frames, 24-bit
    BI_RGB, bottom-up rows with 4-byte padding), the same frame layout
    as the BMP branch of :func:`decode_image`.

    Returns ``(fmt, width, height, micros_per_frame, frames)`` with
    ``frames`` a list of (H, W, 3) uint8 RGB arrays, or ``None`` for a
    null blob. Raises ``NotImplementedError`` for any compressed codec
    — unless PyAV is importable, in which case the package-gated seam
    (:func:`_av_decode`, same gating pattern as :func:`_pil_decode`)
    decodes it to the same contract. Raises ``ValueError`` for
    recognized-but-corrupt files (quarantine, not the codec seam)."""
    if blob is None:
        return None
    b = bytes(blob)
    try:
        return _decode_avi_pure(b)
    except NotImplementedError:
        decoded = _av_decode(b)
        if decoded is not None:
            return decoded
        raise


def _av_decode(b: bytes):
    """OPTIONAL real-codec seam for video: PyAV/ffmpeg when installed,
    None otherwise (and None on av-side failure — package presence must
    not change a corrupt blob's quarantine class)."""
    try:
        import av
    except ImportError:
        return None
    import io

    try:
        with av.open(io.BytesIO(b)) as container:
            vstreams = [
                s for s in container.streams if s.type == "video"
            ]
            if not vstreams:
                return None
            vs = vstreams[0]
            frames = [
                f.to_ndarray(format="rgb24")
                for f in container.decode(vs)
            ]
            if not frames:
                return None
            rate = vs.average_rate
            micros = int(1_000_000 / rate) if rate else 0
            h, w = frames[0].shape[:2]
            fmt = container.format.name.split(",")[0]
            return (fmt, w, h, micros, frames)
    except Exception:
        return None


def _decode_avi_pure(b: bytes):
    """Pure-parser branch of :func:`decode_video` (uncompressed AVI);
    raises NotImplementedError at the codec seam."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "unrecognized video container (only uncompressed AVI decodes "
            "codec-free) — plug ffmpeg in here"
        )

    def chunks(buf, pos, end):
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            payload_end = pos + 8 + size
            if payload_end > end:
                raise ValueError("truncated AVI chunk")
            yield fourcc, pos + 8, payload_end
            pos = payload_end + (size % 2)  # word alignment

    micros = w = h = None
    bpp = compression = None
    frames = []
    for fourcc, s, e in chunks(b, 12, len(b)):
        if fourcc != b"LIST":
            continue
        kind = b[s : s + 4]
        if kind == b"hdrl":
            for f2, s2, e2 in chunks(b, s + 4, e):
                if f2 == b"avih":
                    micros = int.from_bytes(b[s2 : s2 + 4], "little")
                    w = int.from_bytes(b[s2 + 32 : s2 + 36], "little")
                    h = int.from_bytes(b[s2 + 36 : s2 + 40], "little")
                elif f2 == b"LIST" and b[s2 : s2 + 4] == b"strl":
                    # bind strf to the FIRST video stream's strl only: a
                    # later audio strl's WAVEFORMATEX would otherwise be
                    # misread as the bitmap header (wBitsPerSample=16
                    # parsed as bpp, rejecting a decodable video)
                    stream_type = None
                    for f3, s3, e3 in chunks(b, s2 + 4, e2):
                        if f3 == b"strh":
                            stream_type = b[s3 : s3 + 4]
                        elif (
                            f3 == b"strf"
                            and stream_type == b"vids"
                            and bpp is None
                        ):
                            bpp = int.from_bytes(
                                b[s3 + 14 : s3 + 16], "little"
                            )
                            compression = int.from_bytes(
                                b[s3 + 16 : s3 + 20], "little"
                            )
        elif kind == b"movi":
            if w is None or bpp is None:
                raise ValueError("AVI movi before hdrl")
            if bpp != 24 or compression != 0:
                raise NotImplementedError(
                    f"AVI bpp={bpp} compression={compression} needs a "
                    "codec (only 24-bit BI_RGB '00db' frames decode "
                    "codec-free)"
                )
            if w <= 0 or h is None or h <= 0:
                raise ValueError(f"degenerate AVI dimensions {w}x{h}")
            stride = (w * 3 + 3) // 4 * 4
            for f2, s2, e2 in chunks(b, s + 4, e):
                if f2 not in (b"00db", b"00dc"):
                    continue
                if f2 == b"00dc":
                    raise NotImplementedError(
                        "compressed AVI frame ('00dc') needs a codec"
                    )
                raster = b[s2:e2]
                if len(raster) != stride * h:
                    raise ValueError(
                        f"truncated AVI frame: {len(raster)}/{stride * h}"
                    )
                rows = np.frombuffer(raster, dtype=np.uint8).reshape(
                    h, stride
                )
                px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1][::-1]
                frames.append(np.ascontiguousarray(px))
    if micros is None or not frames:
        raise ValueError("AVI without header or frames")
    return ("avi", w, h, micros, frames)


_VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("micros_per_frame", T.LongType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def video_stats(media: DataFrame) -> DataFrame:
    """Per-video curation stats off the REAL decode: geometry, frame
    count, frame interval, and exact per-channel means over ALL frames
    (integer sums, HALF-UP 6-dp — same contract as image_stats).
    Corrupt/compressed blobs and NULL content become quarantine rows
    with ``decode_error`` set, never dropped rows."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    rows.append(
                        (mid, None, None, None, None, None, None,
                         None, None, None, "NullContent")
                    )
                    continue
                try:
                    fmt, w, h, micros, frames = decode_video(blob)
                    n = w * h * len(frames)
                    sums = np.zeros(3, dtype=np.int64)
                    for f in frames:
                        sums += f.astype(np.int64).sum(axis=(0, 1))
                    means = [
                        ((int(s) * 2_000_000 + n) // (2 * n)) / 1e6
                        for s in sums
                    ]
                    rows.append(
                        (mid, fmt, w, h, len(frames), micros,
                         n, means[0], means[1], means[2], None)
                    )
                except (NotImplementedError, ValueError) as exc:
                    rows.append(
                        (mid, None, None, None, None, None, None,
                         None, None, None, type(exc).__name__)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _VIDEO_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        op, _VIDEO_STATS_SCHEMA
    )


def sample_video_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """REAL frame sampling: decode the AVI, keep every ``stride``-th
    frame, re-encode each kept frame as binary PPM (P6) — the
    codec-backed sibling of the byte-slicing :func:`frame_sample`
    (which remains the raw-blob fallback). Undecodable blobs yield no
    frames (run :func:`video_stats` first for the quarantine ledger)."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, payloads = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                try:
                    _, w, h, _, frames = decode_video(blob)
                except (NotImplementedError, ValueError):
                    continue
                for i in range(0, len(frames), stride):
                    header = f"P6\n{w} {h}\n255\n".encode()
                    ids.append(mid)
                    nos.append(i)
                    payloads.append(header + frames[i].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": payloads}
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def audio_pcm_stats(media: DataFrame) -> DataFrame:
    """Per-clip stats for RAW PCM16 little-endian audio — n_samples, RMS
    amplitude, absolute peak. Unlike the image/video kernels this needs
    NO external codec: raw PCM is just int16 byte pairs, so the decode
    (`numpy.frombuffer('<i2')`) is real, not stubbed — the loudness/
    clipping screen an audio curation pipeline runs before any model.

    Arrow-batched mapInPandas, one BLAS pass per batch, no shuffle; an
    odd trailing byte is ignored (frombuffer semantics). RMS sums squares
    of int16 values in float64 (exact below 2^53), rounds to 6 dp.

    Output: (media_id, n_samples long, rms double, peak long).
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("peak", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rmss, peaks = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                b = bytes(blob)
                v = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
                ids.append(mid)
                ns.append(len(v))
                if len(v):
                    x = v.astype(np.float64)
                    rmss.append(round(float(np.sqrt((x * x).sum() / len(v))), 6))
                    # widen BEFORE abs: np.abs(int16(-32768)) overflows
                    # back to -32768 and would under-report the peak
                    peaks.append(int(np.abs(v.astype(np.int64)).max()))
                else:
                    rmss.append(None)
                    peaks.append(None)
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "rms": rmss, "peak": peaks}
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def image_stats(media: DataFrame) -> DataFrame:
    """Per-image pixel statistics via the REAL codec-free decode
    (:func:`decode_image`): format, dimensions, pixel count, and exact
    per-channel means — the resolution/brightness screen an image
    curation pipeline runs before any model, and the image twin of
    ``audio_pcm_stats``.

    Channel sums are exact uint8 integer sums accumulated in int64
    (exact below 2^53 pixels/image), divided once and 6-dp rounded, so
    results are bit-identical across engines and partitionings.
    Arrow-batched mapInPandas, no shuffle. Undecodable/corrupt blobs
    yield a row with null stats and the error class in ``decode_error``
    (quarantine-friendly: the scan never dies mid-corpus on one bad
    file).

    Output: (media_id, format, width, height, n_pixels,
    mean_r, mean_g, mean_b, decode_error).
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_pixels", T.LongType(), True),
            T.StructField("mean_r", T.DoubleType(), True),
            T.StructField("mean_g", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
            T.StructField("decode_error", T.StringType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    # preserve the row (null stats + error class), like
                    # extract_features/resize_images — dropping it would
                    # silently lose the media_id from downstream joins
                    rows.append(
                        (mid, None, None, None, None, None, None, None,
                         "NullContent")
                    )
                    continue
                try:
                    fmt, w, h, px = decode_image(blob)
                except (NotImplementedError, ValueError) as exc:
                    rows.append(
                        (mid, None, None, None, None, None, None, None,
                         type(exc).__name__)
                    )
                    continue
                sums = px.astype(np.int64).sum(axis=(0, 1))
                n = w * h

                def r6(s: int) -> float:
                    # exact half-UP 6-dp rounding in integer math —
                    # Python round() ties-to-even would diverge from
                    # SQL ROUND on exact .5 ties like 92.6328125
                    return ((int(s) * 2_000_000 + n) // (2 * n)) / 1e6

                rows.append(
                    (
                        mid, fmt, w, h, int(n),
                        r6(sums[0]), r6(sums[1]), r6(sums[2]),
                        None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height", "n_pixels",
                    "mean_r", "mean_g", "mean_b", "decode_error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def encode_ppm(pixels) -> bytes:
    """(H, W, 3) uint8 RGB array -> binary PPM (P6) bytes — the inverse
    of :func:`decode_image` for the codec-free interchange format."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Image resize plumbing: (media_id, content, meta) -> same shape with
    ``content`` replaced by the resized image bytes and ``meta`` updated
    to the target dimensions. ``decoder="real"`` decodes with
    :func:`decode_image` (NetPBM/BMP24, codec-free), nearest-neighbor
    resamples with a deterministic integer grid (floor(i·src/dst) —
    identical on every platform, no float filter kernels), and re-encodes
    as binary PPM; compressed inputs raise at the codec seam. With
    ``decoder="fake"`` the output bytes are a deterministic md5-keyed
    stream of exactly width*height bytes (schema/meta/batch plumbing
    without any decode). Arrow-batched mapInPandas, no shuffle; executor
    memory bounded by arrow.maxRecordsPerBatch.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    out.append((mid, None, None))
                    continue
                if decoder == "real":
                    _, sw, sh, px = decode_image(blob)
                    ys = (np.arange(height) * sh) // height
                    xs = (np.arange(width) * sw) // width
                    resized = np.ascontiguousarray(px[ys][:, xs])
                    body = encode_ppm(resized)
                    out.append(
                        (mid, body, ("ppm", width, height, len(body)))
                    )
                    continue
                seed = hashlib.md5(bytes(blob)).digest()
                n = width * height
                body = (seed * (n // len(seed) + 1))[:n]
                out.append(
                    (mid, body, ("fake-raw", width, height, len(body)))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "content", "meta"]
            )

    return media.select("media_id", "content").mapInPandas(op, MEDIA_SCHEMA)
