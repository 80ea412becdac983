"""Multimodal column conventions + processing plumbing.

Convention: a multimodal asset is a row with
  - ``content``: BinaryType — the opaque payload (image/audio/video bytes)
  - ``media_type``: StringType — MIME-ish tag ('image/png', 'audio/wav')
  - ``meta``: StructType — typed metadata (width/height/duration/...)

The Spark-side plumbing (schema, partitioning, Arrow batch shape through
``mapInPandas``) is real and tested, and so are the codecs for the
container-feasible formats: ``decode_image`` is a pure-stdlib PNG decoder
(zlib inflate + scanline unfilter), ``decode_bmp`` an uncompressed-BMP
decoder (both normalize to the same top-down RGB(A) row contract, so
every downstream stage is codec-agnostic), and ``decode_audio`` a stdlib
``wave`` PCM decoder, and baseline JPEG decodes for real through
``operators/jpeg.py`` (pure numpy DCT + Huffman). ``extract_features``
routes by media_type — PNG/BMP/JPEG/WAV rows get real decoded
features; a JPEG the baseline decoder refuses (progressive,
arithmetic) degrades to honest header metadata via ``jpeg_dimensions``
(a pure-stdlib SOF-marker walk) plus a byte histogram; anything else
falls back to the deterministic byte histogram so the distributed path
still runs for formats whose codec libraries (ffmpeg-class video)
aren't installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal asset row.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("n_chars", LongType(), True),
                    StructField("lang", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Feature-extraction output schema for mapInPandas (must be declared up
# front — streaming-safe, no schema inference at runtime).
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Pure-stdlib PNG decoder (8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced): chunk walk → zlib-inflate IDAT → undo the five PNG
    scanline filters. Returns (width, height, channels, rows) with each
    row the unfiltered scanline bytes (len == width*channels).

    Real decode path (replaces the earlier container-limited stub);
    swap in PIL/opencv for palette/16-bit/interlaced inputs.
    """
    import struct
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos : pos + 4])
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={depth} interlace={interlace}")
    try:
        channels = {0: 1, 4: 2, 2: 3, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"unsupported PNG color type {ctype}") from None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows: list[bytes] = []
    prev = bytearray(stride)
    i = 0
    for _y in range(height):
        ft = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if ft == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        rows.append(bytes(line))
        prev = line
    return width, height, channels, rows


def decode_bmp(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Pure-stdlib BMP decoder (uncompressed BI_RGB, 24/32-bit,
    BITMAPINFOHEADER-family): returns (width, height, channels, rows)
    in the SAME contract as ``decode_image`` — rows top-down, pixels in
    RGB(A) order (BMP stores BGR(A) bottom-up with 4-byte row padding;
    both are normalized here so every downstream stage — features,
    resize, frame sampling — is codec-agnostic)."""
    import struct

    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP (bad signature)")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height_raw = struct.unpack("<ii", content[18:26])
    _planes, bpp = struct.unpack("<HH", content[26:30])
    (compression,) = struct.unpack("<I", content[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if width <= 0 or height_raw == 0:
        raise ValueError("bad BMP dimensions")
    bottom_up = height_raw > 0
    height = abs(height_raw)
    src_ch = bpp // 8
    channels = 3 if bpp == 24 else 4
    stride = (width * src_ch + 3) & ~3  # rows pad to 4-byte boundaries
    if len(content) < data_off + stride * height:
        raise ValueError("truncated BMP pixel data")
    rows: list[bytes] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        line = content[data_off + src_y * stride:][: width * src_ch]
        out = bytearray(width * channels)
        for x in range(width):
            b, g, r = line[x * src_ch : x * src_ch + 3]
            out[x * channels : x * channels + 3] = bytes((r, g, b))
            if channels == 4:
                out[x * channels + 3] = line[x * src_ch + 3]
        rows.append(bytes(out))
    return width, height, channels, rows


def _decode_jpeg(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Baseline JPEG pixel decode (operators/jpeg.py: pure numpy DCT +
    Huffman — same (w, h, c, rows) contract as the PNG/BMP decoders).
    Progressive/arithmetic streams raise ValueError and degrade per-row
    to the dimension-probe + byte-histogram path in extract_features."""
    from mysql2parquet_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(content)


_IMAGE_DECODERS = {
    "image/png": decode_image,
    "image/bmp": decode_bmp,
    "image/x-ms-bmp": decode_bmp,
    "image/jpeg": _decode_jpeg,
    "image/jpg": _decode_jpeg,
}

#: SOF (start-of-frame) marker codes: 0xC0-0xCF minus DHT (C4),
#: JPG-reserved (C8) and DAC (CC). Baseline C0, extended C1,
#: progressive C2, lossless C3, and the differential/arithmetic
#: variants all carry the same precision/height/width/components
#: layout.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_dimensions(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a JPEG's first SOF segment —
    pure-stdlib marker walk, no entropy decode. JPEG pixel decoding
    needs a DCT + Huffman implementation (PIL/libjpeg territory), but
    the dominant real-world image format deserves honest METADATA
    rather than a byte histogram: the segment stream is length-prefixed
    (SOI, then FF-marker segments) and every SOF variant stores
    precision(1) height(2) width(2) n_components(1) at its head."""
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    i, n = 2, len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9 or marker == 0xDA:
            # EOI, or SOS (entropy-coded data; SOF must precede it)
            break
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        if marker in _JPEG_SOF_MARKERS:
            seg = content[i + 4 : i + 2 + seg_len]
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            channels = seg[5]
            if not (width and height and channels):
                raise ValueError("bad JPEG SOF dimensions")
            return width, height, channels
        i += 2 + seg_len
    raise ValueError("JPEG SOF marker not found")


#: formats whose pixel decoder can REFUSE a valid file (progressive
#: JPEG, arithmetic coding): feature extraction falls back to
#: [width, height, channels] from this header probe + byte histogram
#: for that row instead of losing the dimensions entirely.
_IMAGE_DIMENSION_PROBES = {
    "image/jpeg": jpeg_dimensions,
    "image/jpg": jpeg_dimensions,
}


def decode_any_image(
    media_type: str, content: bytes
) -> tuple[int, int, int, list[bytes]]:
    """Route to the codec for ``media_type``; raises for types with no
    registered decoder (callers degrade per-row)."""
    try:
        dec = _IMAGE_DECODERS[media_type]
    except KeyError:
        raise ValueError(f"no image decoder for {media_type!r}") from None
    return dec(content)


def decode_audio(content: bytes) -> tuple[int, list[float]]:
    """Pure-stdlib WAV (PCM) decoder via ``wave``: returns
    (sample_rate, samples) with interleaved samples normalized to
    [-1, 1]. 8- and 16-bit PCM; swap in soundfile/librosa for
    float32/24-bit/compressed formats."""
    import array
    import io as _io
    import wave

    with wave.open(_io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = array.array("h")
        samples.frombytes(raw)
        return rate, [s / 32768.0 for s in samples]
    if width == 1:  # WAV 8-bit is unsigned
        return rate, [(b - 128) / 128.0 for b in raw]
    raise ValueError(f"unsupported WAV sample width {width}")


def byte_histogram(content: bytes, bins: int = 16) -> list[float]:
    """Deterministic fake feature extractor: normalized histogram of byte
    values — stands in for an image/audio embedding so the distributed
    plumbing is testable without codecs."""
    if content is None or len(content) == 0:
        return [0.0] * bins
    counts = [0] * bins
    for byt in content:
        counts[byt * bins // 256] += 1
    n = float(len(content))
    return [c / n for c in counts]


def _pixel_features(
    width: int, height: int, channels: int, rows: list[bytes]
) -> list[float]:
    """[width, height, channels, mean/255 per channel] from decoded
    pixels — codec-agnostic (every decoder emits the same row
    contract)."""
    sums = [0] * channels
    for row in rows:
        for x, v in enumerate(row):
            sums[x % channels] += v
    n = float(width * height) or 1.0
    return [float(width), float(height), float(channels)] + [
        s / n / 255.0 for s in sums
    ]


def png_features(content: bytes) -> list[float]:
    """Real image features from a decoded PNG — the shape a resize/embed
    stage would start from."""
    return _pixel_features(*decode_image(content))


def bmp_features(content: bytes) -> list[float]:
    """Same features from a decoded BMP (shared pixel contract)."""
    return _pixel_features(*decode_bmp(content))


def wav_features(content: bytes) -> list[float]:
    """Real audio features from decoded PCM: [sample_rate, n_samples,
    rms, peak] — the shape a frame-sample/embed stage would start from."""
    rate, samples = decode_audio(content)
    n = len(samples)
    if n == 0:
        return [float(rate), 0.0, 0.0, 0.0]
    rms = (sum(s * s for s in samples) / n) ** 0.5
    return [float(rate), float(n), rms, max(abs(s) for s in samples)]


def extract_features(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    media_type_col: str = "media_type",
    bins: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over binary content via
    ``mapInPandas`` — the pattern for any decode/resize/frame-sample step.
    Routes by media type: PNG and WAV payloads run the REAL decoders;
    other types fall back to the deterministic byte histogram.

    Each partition streams through as pandas batches; per-batch Python
    cost is amortized over thousands of rows. At 100 TB, repartition by a
    size-balanced key first so no single task gets all the 4K videos.
    """

    def features_for(media_type: str, b: bytes) -> list[float]:
        if b is None:
            return []
        # Per-row degradation: at corpus scale a single truncated or
        # mislabeled payload must not abort the distributed job — a
        # decoder failure (any exception: corrupt bytes can raise
        # zlib.error, struct.error, ValueError, IndexError, ...) falls
        # back to the typed-bytes histogram for that ROW only.
        try:
            if media_type in _IMAGE_DECODERS:
                try:
                    return _pixel_features(*decode_any_image(media_type, b))
                except Exception:
                    if media_type not in _IMAGE_DIMENSION_PROBES:
                        raise
                    # pixel decode refused (progressive JPEG, truncated
                    # scan): the SOF dimension probe still reads the
                    # header, so the row keeps honest w/h/c + histogram
                    w, h, c = _IMAGE_DIMENSION_PROBES[media_type](b)
                    return [float(w), float(h), float(c)] + byte_histogram(
                        b, bins
                    )
            if media_type in ("audio/wav", "audio/x-wav"):
                return wav_features(b)
        except Exception:
            pass
        return byte_histogram(b, bins)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "media_type": pdf[media_type_col],
                    "n_bytes": pdf[content_col].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": [
                        features_for(mt, b)
                        for mt, b in zip(pdf[media_type_col], pdf[content_col])
                    ],
                }
            )

    cols = [id_col, content_col, media_type_col]
    return assets.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def text_as_binary_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal-shaped asset table from the documents fixture
    (text bytes as payload) — deterministic stand-in for real media."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.col("n_chars").alias("n_chars"), F.col("lang").alias("lang")
        ).alias("meta"),
    )


def encode_bmp_gray(values: list[list[int]]) -> bytes:
    """Encode a row-major grid of 0-255 gray values as a 24-bit BI_RGB
    BMP (R=G=B — the 256-total luma weights make integer luma == the
    gray value EXACTLY, see operators/phash.py). Pure stdlib, the
    encode twin of ``decode_bmp``."""
    import struct

    h = len(values)
    w = len(values[0])
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    )
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for v in values[y]:
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        body += row
    return header + bytes(body)


def synth_bmp_assets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    groups: int = 40,
    size: int = 16,
    pattern_mod: int = 181,
    brightness_mod: int = 60,
) -> DataFrame:
    """Deterministic synthetic image corpus with PLANTED near-dup
    structure: each row gets a ``size``×``size`` gray BMP whose base
    pattern depends only on ``id % groups`` (md5 counter-mode bytes —
    content-addressed, no RNG) plus a per-row brightness offset
    ``(id // groups) % brightness_mod``. Pattern values stay below
    ``pattern_mod`` and offsets below ``brightness_mod`` with
    ``pattern_mod + brightness_mod <= 256``, so no pixel ever clips —
    every row in a group is an EXACT brightness shift of the group's
    base image, which pHash is exactly invariant to (operators/
    phash.py module doc). The expected duplicate clusters are therefore
    ``id % groups`` — a SQL-expressible ground truth that turns a
    DCT-hash pipeline into an exactly-oracle-checkable query.

    One mapInPandas projection (zero shuffles); base patterns are
    cached per group inside the worker (``groups`` is bounded)."""
    import hashlib

    if pattern_mod + brightness_mod > 256:
        raise ValueError("pattern_mod + brightness_mod must be <= 256")

    def _pattern(gid: int) -> list[list[int]]:
        need = size * size
        out: list[int] = []
        blk = 0
        while len(out) < need:
            out.extend(
                hashlib.md5(
                    f"phash-pat:{gid}:{blk}".encode()
                ).digest()
            )
            blk += 1
        return [
            [out[y * size + x] % pattern_mod for x in range(size)]
            for y in range(size)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, list[list[int]]] = {}
        for pdf in batches:
            ids, blobs = [], []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                gid = i % groups
                if gid not in cache:
                    cache[gid] = _pattern(gid)
                b = (i // groups) % brightness_mod
                ids.append(i)
                blobs.append(
                    encode_bmp_gray(
                        [[v + b for v in row] for row in cache[gid]]
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "content": blobs,
                    "media_type": ["image/bmp"] * len(ids),
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("media_type", StringType(), True),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(run, schema)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("pixels", BinaryType(), True),
    ]
)


def resize_image_nn(
    content: bytes, out_w: int, out_h: int, media_type: str = "image/png"
) -> tuple[int, int, int, bytes]:
    """Nearest-neighbor resample of a decoded image (any registered
    codec) → (width, height, channels, row-major raw pixel bytes). Pure
    stdlib on the REAL decoded pixels; swap the sampling kernel
    (bilinear, Lanczos via PIL/opencv) without touching the distributed
    plumbing."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    w, h, c, rows = decode_any_image(media_type, content)
    out = bytearray()
    for y in range(out_h):
        row = rows[min(h - 1, (y * h) // out_h)]
        for x in range(out_w):
            sx = min(w - 1, (x * w) // out_w)
            out += row[sx * c : (sx + 1) * c]
    return out_w, out_h, c, bytes(out)


def with_resized(
    assets: DataFrame,
    width: int,
    height: int,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    media_type_col: str = "media_type",
) -> DataFrame:
    """Arrow-batched image resize stage (mapInPandas): image payloads
    (any registered codec — PNG, BMP) decode + nearest-neighbor resample
    to ``width``×``height``; non-image or corrupt payloads degrade to
    NULL pixels for that ROW (never a job abort — same contract as
    extract_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": pdf[id_col], "width": [], "height": [],
                   "channels": [], "pixels": []}
            for mt, b in zip(pdf[media_type_col], pdf[content_col]):
                try:
                    if mt not in _IMAGE_DECODERS or b is None:
                        raise ValueError("not an image")
                    rw, rh, c, px = resize_image_nn(bytes(b), width, height, mt)
                    out["width"].append(rw)
                    out["height"].append(rh)
                    out["channels"].append(c)
                    out["pixels"].append(px)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["pixels"].append(None)
            yield pd.DataFrame(out)

    cols = [id_col, content_col, media_type_col]
    return assets.select(*cols).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("frame_idx", IntegerType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def frame_features(
    content: bytes, media_type: str, n_frames: int, *, bins: int = 8
) -> list[list[float]]:
    """Evenly spaced frame sampling → per-frame feature vectors.

    WAV payloads sample ``n_frames`` equal windows of REAL decoded PCM
    ([rms, peak] per window — silence/beep structure survives). There is
    no video codec in this container, so any other payload uses the
    deterministic fake: byte-range segments → normalized histograms
    (the Spark-side shape — 1 asset → n frame rows — is the real part;
    swap in pyav frame extraction without touching the plumbing)."""
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    try:
        if media_type in ("audio/wav", "audio/x-wav"):
            _rate, samples = decode_audio(content)
            if not samples:
                return [[0.0, 0.0] for _ in range(n_frames)]
            out = []
            for i in range(n_frames):
                seg = samples[
                    i * len(samples) // n_frames : (i + 1) * len(samples) // n_frames
                ] or [0.0]
                rms = (sum(s * s for s in seg) / len(seg)) ** 0.5
                out.append([rms, max(abs(s) for s in seg)])
            return out
    except Exception:
        pass
    return [
        byte_histogram(
            content[i * len(content) // n_frames : (i + 1) * len(content) // n_frames],
            bins,
        )
        for i in range(n_frames)
    ]


def sample_frames(
    assets: DataFrame,
    n_frames: int = 4,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    media_type_col: str = "media_type",
    bins: int = 8,
) -> DataFrame:
    """Frame-sampling stage (mapInPandas, 1 asset → ``n_frames`` rows):
    the batch fan-out shape every video/audio pipeline needs. Output is
    (asset_id, frame_idx, features) — a windowless explode, zero
    shuffle; partition sizing guidance as extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for aid, mt, b in zip(
                pdf[id_col], pdf[media_type_col], pdf[content_col]
            ):
                frames = (
                    [[0.0] * bins] * n_frames
                    if b is None or len(b) == 0
                    else frame_features(bytes(b), mt, n_frames, bins=bins)
                )
                for i, fv in enumerate(frames):
                    ids.append(aid)
                    idxs.append(i)
                    feats.append(fv)
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "features": feats}
            )

    cols = [id_col, content_col, media_type_col]
    return assets.select(*cols).mapInPandas(run, FRAME_SCHEMA)


def encode_wav_pcm16(samples: list[float], rate: int = 8000) -> bytes:
    """Encode [-1, 1] samples as 16-bit PCM WAV — the encode twin of
    ``decode_audio``. Pure stdlib."""
    import io as _io
    import wave

    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                int(max(-1.0, min(1.0, s)) * 32767).to_bytes(
                    2, "little", signed=True
                )
                for s in samples
            )
        )
    return buf.getvalue()


def synth_wav_assets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    frame_len: int = 160,
    rate: int = 8000,
) -> DataFrame:
    """Deterministic synthetic audio corpus with PLANTED silence
    structure (the D47 synth-BMP recipe for the audio column): row
    ``id`` gets ``id % 5`` leading silent frames, ``3 + (id//5) % 4``
    active frames (alternating ±0.5 — frame RMS ≈ 0.5), and
    ``(id//20) % 3`` trailing silent frames, each ``frame_len``
    samples. The expected trim points are therefore pure integer
    arithmetic on the id — a SQL-expressible ground truth that turns
    the encode → decode → per-frame-RMS → trim pipeline into an
    exactly-oracle-checkable query. One mapInPandas projection, zero
    shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                lead, active, trail = (
                    i % 5, 3 + (i // 5) % 4, (i // 20) % 3,
                )
                samples = [0.0] * (lead * frame_len)
                for k in range(active * frame_len):
                    samples.append(0.5 if k % 2 == 0 else -0.5)
                samples += [0.0] * (trail * frame_len)
                ids.append(i)
                blobs.append(encode_wav_pcm16(samples, rate))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "content": blobs,
                    "media_type": ["audio/wav"] * len(ids),
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("media_type", StringType(), True),
        ]
    )
    return df.select(id_col).mapInPandas(run, schema)


AUDIO_ACTIVITY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("lead_silence", LongType(), True),
        StructField("trail_silence", LongType(), True),
        StructField("active_frames", LongType(), True),
        StructField("speech_ratio", DoubleType(), True),
    ]
)


def audio_activity(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    frame_len: int = 160,
    threshold: float = 0.01,
) -> DataFrame:
    """Energy-based voice-activity segmentation (D55) — the
    silence-trim step every speech-data pipeline runs before training
    (and the audio-side sibling of D52's text gates): decode PCM, cut
    it into ``frame_len``-sample frames (a trailing partial frame
    counts), mark a frame ACTIVE iff its RMS exceeds ``threshold``,
    and report per asset: total frames, leading/trailing silent runs
    (the trim points), active-frame count, and ``speech_ratio``
    (active/total, floor-quantized 1e-4 — the D52 tie rule). A fully
    silent asset reports ``lead = trail = n_frames`` and ratio 0 —
    the "drop me" signature.

    Plan shape: ONE mapInPandas projection (decode + RMS per row —
    the C5 contract: Python only inside Arrow batches), zero shuffles,
    output rows constant-width regardless of audio length. Real
    pipelines swap the stdlib decoder for soundfile without touching
    the plumbing."""
    import math

    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1: {frame_len}")
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0: {threshold}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_ACTIVITY_SCHEMA.fields}
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                _rate, samples = decode_audio(bytes(blob))
                frames = [
                    samples[i : i + frame_len]
                    for i in range(0, len(samples), frame_len)
                ]
                act = [
                    (sum(s * s for s in f) / len(f)) ** 0.5 > threshold
                    for f in frames
                ]
                n = len(frames)
                n_active = sum(act)
                if n_active:
                    lead = act.index(True)
                    trail = act[::-1].index(True)
                else:
                    lead = trail = n
                ratio = (
                    math.floor(n_active / n * 10_000.0) / 10_000.0
                    if n
                    else 0.0
                )
                out["asset_id"].append(int(aid))
                out["n_frames"].append(n)
                out["lead_silence"].append(lead)
                out["trail_silence"].append(trail)
                out["active_frames"].append(n_active)
                out["speech_ratio"].append(ratio)
            yield pd.DataFrame(out)

    return assets.select(id_col, content_col).mapInPandas(
        run, AUDIO_ACTIVITY_SCHEMA
    )
