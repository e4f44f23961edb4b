"""Multimodal column conventions: binary payloads + typed metadata.

North-star surface (BASELINE.json): image/audio/video as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` stages. Two REAL pure-numpy decode kernels ship here —
:func:`decode_bmp` (BMP header parse) and :func:`decode_wav` (RIFF/WAVE
header parse) — so the Arrow batch path decodes actual bytes end-to-end
with no external media lib. Formats needing real codecs (JPEG/PNG/MP3/…)
remain gated: pass ``decoder=``/``extractor=`` (e.g. PIL
``Image.open(BytesIO(b)).size``) or ``fake=True`` for the deterministic
synthetic kernel; otherwise a guided error. The Spark-side plumbing —
schema convention, batch iteration shape, partition sizing — is identical
for every kernel.

Scale notes: binary payloads dominate row size — ``repartition`` by byte
budget (``target_partition_bytes``), never by row count, so Arrow batches
fit executor memory; metadata-only operations (filter by width, group by
format) must project AWAY the binary column first so the Parquet scan never
reads the blob pages (column pruning is the whole game at 100 TB of media).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_bmp",
    "decode_wav",
    "synth_bmp",
    "synth_bmp_pixels",
    "dhash_images",
    "synth_wav",
    "decode_images",
    "safe_decode_images",
    "decode_audio",
    "extract_features",
    "sample_frames",
    "synth_wav_samples",
    "fingerprint_audio",
]

# Column convention: one binary payload + one typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", IntegerType()),
                ]
            ),
        ),
    ]
)


def media_table(df: DataFrame, id_col: str, payload_col: str, fmt_col: str | None = None) -> DataFrame:
    """Normalize any (id, binary) frame into the engine's media convention,
    deriving cheap metadata (byte length, format tag) natively — no Python
    touches the blob for metadata queries."""
    meta = F.struct(
        (F.col(fmt_col) if fmt_col else F.lit("unknown")).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(payload_col)).cast("int").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic synthetic decode: dimensions derived from a content
    hash — stable across runs/partitions, so tests can assert values."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def decode_bmp(payload: bytes) -> tuple[int, int]:
    """REAL pure-numpy BMP decode: validate the ``BM`` magic and the
    BITMAPINFOHEADER, read ``biWidth``/``biHeight`` (int32 LE at byte
    offsets 18/22). No image library involved — the header layout is the
    public BMP file-format spec. Raises ``ValueError`` on non-BMP bytes
    so a mixed-format corpus fails loudly instead of mis-measuring."""
    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 2 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    if len(b) < 26:
        raise ValueError("truncated BMP header")
    dib_size = int(np.frombuffer(b, dtype="<u4", count=1, offset=14)[0])
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    w, h = np.frombuffer(b, dtype="<i4", count=2, offset=18)
    return int(w), abs(int(h))  # negative height = top-down rows


def decode_pgm(payload: bytes) -> tuple[int, int]:
    """REAL pure-python PGM (binary P5) decode — the second image codec
    through the injectable-kernel seam, proving the contract generalizes
    beyond BMP with a second real format: validate the ``P5`` magic, then
    read the whitespace-separated ASCII header tokens (width, height,
    maxval) with ``#``-comment skipping per the public Netpbm spec, and
    check the raster is actually present. Returns ``(width, height)``."""
    b = bytes(payload or b"")
    if len(b) < 2 or b[:2] != b"P5":
        raise ValueError("not a PGM payload (missing 'P5' magic)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PGM header")
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PGM maxval {maxval}")
    if len(b) - pos < w * h:
        raise ValueError("PGM raster shorter than width*height")
    return int(w), int(h)


def synth_pgm(seed, width: int, height: int) -> F.Column:
    """Build a REAL binary-P5 PGM natively in Spark from a per-row integer
    ``seed``: ASCII header + ``width*height`` deterministic pixel bytes,
    every byte a codegen expression (the :func:`synth_wav_samples`
    discipline — one HOF hex lambda, single ``to_binary``).
    :func:`decode_pgm` round-trips the header exactly, and the pixel
    formula is arithmetic an oracle can replay."""
    s = F.col(seed) if isinstance(seed, str) else seed
    header = F.encode(F.lit(f"P5\n{int(width)} {int(height)}\n255\n"), "ISO-8859-1")
    px_hex = F.transform(
        F.sequence(F.lit(0), F.lit(int(width) * int(height) - 1)),
        lambda k: F.lpad(
            F.hex(F.pmod((s + 1) * (k + 7) * 31, F.lit(256))), 2, "0"
        ),
    )
    return F.concat(header, F.to_binary(F.array_join(px_hex, ""), F.lit("hex")))


def decode_wav(payload: bytes) -> tuple[int, int, int]:
    """REAL pure-numpy WAV decode: validate ``RIFF``/``WAVE`` magic, parse
    the ``fmt `` chunk for (channels, sample_rate, bits), locate the
    ``data`` chunk and derive the per-channel sample count. Returns
    ``(channels, sample_rate, n_samples)``."""
    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, channels, rate, bits = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        csize = int(np.frombuffer(b, dtype="<u4", count=1, offset=pos + 4)[0])
        if cid == b"fmt ":
            channels = int(np.frombuffer(b, "<u2", 1, offset=pos + 10)[0])
            rate = int(np.frombuffer(b, "<u4", 1, offset=pos + 12)[0])
            bits = int(np.frombuffer(b, "<u2", 1, offset=pos + 22)[0])
        elif cid == b"data":
            if channels is None:
                raise ValueError("WAV data chunk before fmt chunk")
            bytes_per_frame = channels * max(bits, 8) // 8
            return channels, rate, csize // bytes_per_frame
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def synth_bmp(width, height) -> F.Column:
    """Build a REAL minimal BMP (54-byte header, no pixel data) natively in
    Spark from integer width/height columns — fixture generator for the
    decode path. Widths/heights must fit one byte (< 256): the int32 LE
    fields are emitted as ``chr(n)`` + three zero bytes, all inside
    codegen, so synthesizing a billion test images is a scan-stage
    expression. ``decode_bmp`` round-trips these bytes exactly."""
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height

    def le32_byte(col):  # value < 256 -> one real byte + 3 zeros
        return F.concat(
            F.encode(F.char(col), "ISO-8859-1"),
            F.to_binary(F.lit("000000"), F.lit("hex")),
        )

    return F.concat(
        F.to_binary(F.lit("424d"), F.lit("hex")),          # 'BM'
        F.to_binary(F.lit("36000000" + "00000000" + "36000000"), F.lit("hex")),
        # ^ file size (54, good enough), reserved, pixel-data offset (54)
        F.to_binary(F.lit("28000000"), F.lit("hex")),      # biSize = 40
        le32_byte(w),                                      # biWidth  @18
        le32_byte(h),                                      # biHeight @22
        F.to_binary(F.lit("0100" + "1800" + "00000000" * 6), F.lit("hex")),
        # ^ planes=1, 24bpp, compression/size/res/colors zeroed
    )


def _le_bytes(col, n_bytes: int) -> F.Column:
    """Render an int column as ``n_bytes`` little-endian bytes, inside
    codegen: per byte, shift-right then ``char`` → ISO-8859-1 (a bijection
    between 0-255 and single bytes)."""
    return F.concat(
        *[
            F.encode(
                F.char((F.shiftright(col, 8 * i) % 256 + 256) % 256),
                "ISO-8859-1",
            )
            for i in range(n_bytes)
        ]
    )


def synth_wav(channels, sample_rate, n_samples) -> F.Column:
    """Build a REAL 16-bit PCM WAV natively in Spark from integer columns:
    44-byte RIFF/fmt/data header plus ``n_samples × channels`` two-byte
    frames of filler audio — all scan-stage expressions, so synthesizing a
    media corpus at any SF never leaves codegen. ``decode_wav``
    round-trips the header exactly."""
    ch = F.col(channels) if isinstance(channels, str) else channels
    sr = F.col(sample_rate) if isinstance(sample_rate, str) else sample_rate
    ns = F.col(n_samples) if isinstance(n_samples, str) else n_samples
    data_size = (ns * ch * F.lit(2)).cast("int")
    header = F.concat(
        F.encode(F.lit("RIFF"), "ISO-8859-1"),
        _le_bytes(F.lit(36) + data_size, 4),
        F.encode(F.lit("WAVEfmt "), "ISO-8859-1"),
        _le_bytes(F.lit(16), 4),           # fmt chunk size
        _le_bytes(F.lit(1), 2),            # PCM
        _le_bytes(ch, 2),
        _le_bytes(sr, 4),
        _le_bytes(sr * ch * F.lit(2), 4),  # byte rate
        _le_bytes(ch * F.lit(2), 2),       # block align
        _le_bytes(F.lit(16), 2),           # bits per sample
        F.encode(F.lit("data"), "ISO-8859-1"),
        _le_bytes(data_size, 4),
    )
    filler = F.encode(
        F.repeat(F.lit("ab"), (ns * ch).cast("int")), "ISO-8859-1"
    )
    return F.concat(header, filler)


def decode_images(
    df: DataFrame,
    fake: bool = False,
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Fill meta.width/height by decoding payloads in Arrow batches.

    Default kernel is the REAL :func:`decode_bmp` when the first payload
    carries the ``BM`` magic; other formats need a codec — pass
    ``decoder(payload) -> (width, height)`` (e.g. PIL
    ``Image.open(BytesIO(b)).size``) or ``fake=True`` for the
    deterministic synthetic kernel, else a guided NotImplementedError
    (the container ships no image libs — BASELINE.json contract).
    """
    if decoder is None and fake:
        decoder = _fake_decode

    schema = df.schema

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = decoder
        for pdf in batches:
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                if payload is None:
                    # NULL payload → NULL dims, independent of row order
                    m["width"], m["height"] = None, None
                    metas.append(m)
                    continue
                if kernel is None:
                    # sniff on the first NON-NULL payload of the partition
                    magic = bytes(payload[:2])
                    if magic == b"BM":
                        kernel = decode_bmp
                    elif magic == b"P5":
                        kernel = decode_pgm
                    else:
                        raise NotImplementedError(
                            "payload is neither BMP nor PGM and no codec "
                            "is available in this environment; pass "
                            "decoder=... or fake=True"
                        )
                w, h = kernel(payload)
                m["width"], m["height"] = int(w), int(h)
                metas.append(m)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


def _decode_error_class(exc: ValueError) -> str:
    """Collapse kernel ValueErrors into the small stable vocabulary the
    quarantine column carries (and oracles can predict from corpus
    construction): bad_magic / truncated / bad_header / decode_error."""
    msg = str(exc)
    if "magic" in msg:
        return "bad_magic"
    if "truncated" in msg or "shorter" in msg:
        return "truncated"
    if "unsupported" in msg:
        return "bad_header"
    return "decode_error"


def safe_decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    kernels: dict[bytes, Callable[[bytes], tuple[int, int]]] | None = None,
) -> DataFrame:
    """Decode with per-row error ROUTING instead of job failure: appends
    ``width``/``height`` (NULL on failure) and ``decode_status`` (NULL on
    success, else ``bad_magic`` / ``truncated`` / ``bad_header`` /
    ``null_payload`` / ``decode_error``) to every row.

    At 100 TB of scraped media, malformed bytes are the NORM — truncated
    downloads, mislabeled formats, exotic header variants. A kernel that
    raises (``decode_images``' contract, right for curated corpora) kills
    a 1000-executor job on one bad row after hours of work; this variant
    quarantines the row and keeps the pipeline moving, and the status
    column makes the corruption profile itself a queryable table. Routing
    is per-row by magic sniff against ``kernels`` (default: the two real
    in-repo codecs, ``BM``→:func:`decode_bmp`, ``P5``→:func:`decode_pgm`);
    unknown magic routes to ``bad_magic`` rather than raising, because at
    scale you audit first and extend the kernel table second. Same
    Arrow-batched ``mapInPandas`` shape as :func:`decode_images`; output
    adds three narrow columns, the payload is never shuffled by the
    downstream status aggregation (project it away first).
    """
    table = dict(kernels or {b"BM": decode_bmp, b"P5": decode_pgm})
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decode_status", StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, statuses = [], [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    widths.append(None)
                    heights.append(None)
                    statuses.append("null_payload")
                    continue
                b = bytes(payload)
                kernel = table.get(b[:2])
                if kernel is None:
                    widths.append(None)
                    heights.append(None)
                    statuses.append("bad_magic")
                    continue
                try:
                    w, h = kernel(b)
                except ValueError as exc:
                    widths.append(None)
                    heights.append(None)
                    statuses.append(_decode_error_class(exc))
                else:
                    widths.append(int(w))
                    heights.append(int(h))
                    statuses.append(None)
            pdf = pdf.copy()
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["decode_status"] = statuses
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def decode_audio(
    df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Audio half of the decode path: payload → ``(channels, sample_rate,
    n_samples)`` columns via Arrow batches. Default kernel is the REAL
    :func:`decode_wav` (RIFF header parse, pure numpy); compressed codecs
    (MP3/FLAC/OGG) need an injected ``decoder`` with the same signature."""
    kernel = decoder or decode_wav
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("channels", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [kernel(p) for p in pdf["payload"]]
            pdf = pdf.copy()
            pdf["channels"] = [d[0] for d in decoded]
            pdf["sample_rate"] = [d[1] for d in decoded]
            pdf["n_samples"] = [d[2] for d in decoded]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    fake: bool = False,
    extractor: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Payload → embedding column (``array<float>``), feeding the
    ``operators.similarity`` stack. Default kernel is REAL numpy
    computation on the actual bytes — an L2-normalized ``dim``-bucket
    byte-value histogram (the classic content-signature baseline; numpy
    vectorized per payload). Model forward passes swap in via
    ``extractor``; ``fake=True`` keeps the hash-derived deterministic
    vector for tests that need dims independent of content length."""
    if extractor is None and fake:

        def extractor(payload: bytes) -> list[float]:
            h = hashlib.sha256(payload or b"").digest()
            raw = [(h[i % 32] - 128) / 128.0 for i in range(dim)]
            norm = sum(x * x for x in raw) ** 0.5 or 1.0
            return [x / norm for x in raw]

    elif extractor is None:
        import numpy as np

        def extractor(payload: bytes) -> list[float]:
            a = np.frombuffer(bytes(payload or b"\x00"), dtype=np.uint8)
            hist = np.bincount(
                (a.astype(np.int32) * dim) // 256, minlength=dim
            )[:dim].astype(np.float64)
            norm = float(np.sqrt((hist * hist).sum())) or 1.0
            return [float(x / norm) for x in hist]

    out_schema = StructType(
        df.schema.fields + [StructField("embedding", ArrayType(FloatType()))]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = [extractor(p) for p in pdf["payload"]]
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling STAND-IN: slices the payload at fixed
    byte offsets into a frames array (real impl: ffmpeg keyframe extraction
    behind the same signature). Demonstrates the explode-after-decode shape:
    one media row → N frame rows, each re-entering ``decode_images``."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.lit(max_frames - 1),
                (F.length("payload") / every_n_bytes).cast("int"),
            ),
        ),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(
                F.col("payload").cast("string"), i * every_n_bytes + 1, 16
            ).alias("frame_sig"),
        ),
    )
    return df.withColumn("frames", frames).withColumn(
        "frame", F.explode_outer("frames")
    ).drop("frames")


DHASH_W, DHASH_H = 9, 8  # 9 columns -> 8 comparisons per row, 8 rows
DHASH_BITS = 60  # keep banding-compatible with dedup.SIMHASH_BITS


def _pix(seed, x: int, y: int):
    """The synthetic pixel intensity formula — shared between the Spark
    byte generator and the DuckDB oracle's arithmetic replay:
    ``((seed+1)*(x+3)*(y+5)*17) % 256`` (multiplicative mixing so the
    dHash bits vary across the grid; a linear ramp made 19 of 37 seeds
    collide)."""
    s = F.col(seed) if isinstance(seed, str) else seed
    return (((s + 1) * (x + 3) * (y + 5) * 17) % 256 + 256) % 256


def synth_bmp_pixels(seed) -> F.Column:
    """A REAL 9×8 24-bpp BMP **with pixel data** generated natively in
    Spark from a per-row integer ``seed``: grayscale intensity
    ``_pix(seed, x, y)`` in all three channels, bottom-up row order and
    4-byte row stride exactly per the BMP spec (9 px × 3 B = 27 → 28 with
    pad). Every byte is a codegen expression — synthesizing a
    billion-image fixture corpus never leaves the JVM, and
    :func:`dhash_images` must parse these bytes FOR REAL (offsets,
    bottom-up rows, stride) to reproduce the oracle's arithmetic hash."""
    def raw_byte(col):  # 0-255 -> one byte (char↔ISO-8859-1 bijection)
        return F.encode(F.char(col), "ISO-8859-1")

    rows = []
    for r in range(DHASH_H):            # file row r = image row (H-1-r)
        y = DHASH_H - 1 - r
        for x in range(DHASH_W):
            px = raw_byte(_pix(seed, x, y))
            rows += [px, px, px]        # BGR, all equal (grayscale)
        rows.append(F.to_binary(F.lit("00"), F.lit("hex")))  # stride pad
    header = F.concat(
        F.to_binary(F.lit("424d"), F.lit("hex")),              # 'BM'
        F.to_binary(F.lit("16010000" "00000000" "36000000"),
                    F.lit("hex")),  # size 278, reserved, data offset 54
        F.to_binary(F.lit("28000000"), F.lit("hex")),          # biSize 40
        F.to_binary(F.lit("09000000" "08000000"), F.lit("hex")),  # 9 × 8
        F.to_binary(F.lit("0100" "1800" + "00000000" * 6), F.lit("hex")),
    )
    return F.concat(header, *rows)


def dhash_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
) -> DataFrame:
    """Perceptual difference-hash over BMP payloads: parse the REAL bytes
    (data offset @10, width @18, height @22, 24 bpp, bottom-up rows,
    4-byte stride) and emit the classic dHash — bit ``y*8+x`` set iff
    ``gray(x+1, y) > gray(x, y)`` over the top-left 9×8 grid, truncated
    to 60 bits so the fingerprint drops straight into
    :func:`~pyveb_spark.operators.dedup.hamming_pairs`' pigeonhole
    banding. Returns ``(id_col, dhash)``.

    Near-duplicate IMAGE detection is the visual twin of SimHash text
    dedup (re-encoded/resized copies differ by a few bits); with the
    shared banding operator the whole multimodal dedup path is one
    band-keyed shuffle. Real codecs (JPEG via PIL) plug in by decoding
    to a 9×8 grayscale grid and reusing the same bit construction.

    Arrow-batched mapInPandas kernel (UDF is unavoidable: byte parsing),
    output is (id, int64) — narrow rows, no payload shuffle anywhere
    downstream.
    """
    out_schema = f"{id_col} long, dhash long"

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    raise ValueError("dhash_images expects BMP payloads")
                off = int.from_bytes(b[10:14], "little")
                w = int.from_bytes(b[18:22], "little", signed=True)
                h = int.from_bytes(b[22:26], "little", signed=True)
                if w < DHASH_W or abs(h) < DHASH_H:
                    raise ValueError(f"image smaller than dHash grid: {w}x{h}")
                stride = ((3 * w + 3) // 4) * 4
                bottom_up = h > 0
                hh = abs(h)

                def gray(x: int, y: int) -> int:
                    row = (hh - 1 - y) if bottom_up else y
                    return b[off + row * stride + 3 * x]  # blue channel

                v = 0
                for y in range(DHASH_H):
                    for x in range(DHASH_W - 1):
                        bit = y * (DHASH_W - 1) + x
                        if bit >= DHASH_BITS:
                            continue
                        if gray(x + 1, y) > gray(x, y):
                            v |= 1 << bit
                ids.append(int(i))
                hashes.append(v)
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.mapInPandas(_hash, schema=out_schema)


# audio fingerprint grid: 128 mono 16-bit samples → 32 frames of 4 →
# 30 energy-delta bits (31 is prime — banding needs bands | bits, so the
# last delta is dropped; 30 = 3 bands × 10 bits in dedup.hamming_pairs
# — with max_hamming=2 the pigeonhole needs only 3 bands, and 10-bit band
# values keep cross-class candidate collisions ~16× rarer than 6-bit ones)
AFP_SAMPLES = 128
AFP_FRAMES = 32
AFP_BITS = AFP_FRAMES - 2


def _sample_lo(seed, k):
    """Low byte of synthetic sample ``k`` (``k`` may be an int or a
    Column) — the ONE copy of the formula shared between the Spark byte
    generator and the oracle's arithmetic replay (the q153 SQL mirrors
    it; edit both together)."""
    s = F.col(seed) if isinstance(seed, str) else seed
    return F.pmod((s + 2) * (k + 3) * 17, F.lit(256))


def _sample_hi(seed, k):
    """High byte of synthetic sample ``k`` (same contract)."""
    s = F.col(seed) if isinstance(seed, str) else seed
    return F.pmod((s + 3) * (k + 5) * 13, F.lit(256))


def synth_wav_samples(seed) -> F.Column:
    """A REAL 44-byte-header mono 16-bit PCM WAV **with sample data**
    generated natively in Spark from a per-row integer ``seed``:
    sample ``k`` is the little-endian int16 ``(lo, hi)`` from
    :func:`_sample_lo`/:func:`_sample_hi`. Every byte is a codegen
    expression (the :func:`synth_bmp_pixels` discipline for audio);
    :func:`fingerprint_audio` must parse the RIFF layout FOR REAL to
    reproduce the oracle's arithmetic fingerprint."""
    s = F.col(seed) if isinstance(seed, str) else seed
    data_size = AFP_SAMPLES * 2
    header = F.concat(
        F.encode(F.lit("RIFF"), "ISO-8859-1"),
        _le_bytes(F.lit(36 + data_size), 4),
        F.encode(F.lit("WAVEfmt "), "ISO-8859-1"),
        _le_bytes(F.lit(16), 4),
        _le_bytes(F.lit(1), 2),                 # PCM
        _le_bytes(F.lit(1), 2),                 # mono
        _le_bytes(F.lit(8000), 4),              # sample rate
        _le_bytes(F.lit(16000), 4),             # byte rate
        _le_bytes(F.lit(2), 2),                 # block align
        _le_bytes(F.lit(16), 2),                # bits/sample
        F.encode(F.lit("data"), "ISO-8859-1"),
        _le_bytes(F.lit(data_size), 4),
    )
    # ONE small lambda evaluated AFP_SAMPLES× per row (hex render, then a
    # single to_binary) — a flat 2·AFP_SAMPLES-term concat of independent
    # byte expressions overflows janino codegen and falls back to
    # interpreted eval, ~2× the whole stage's cost at sf0.1
    sample_hex = F.transform(
        F.sequence(F.lit(0), F.lit(AFP_SAMPLES - 1)),
        lambda k: F.concat(
            F.lpad(F.hex(_sample_lo(s, k)), 2, "0"),
            F.lpad(F.hex(_sample_hi(s, k)), 2, "0"),
        ),
    )
    data = F.to_binary(F.array_join(sample_hex, ""), F.lit("hex"))
    return F.concat(header, data)


def fingerprint_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
) -> DataFrame:
    """Energy-delta audio fingerprint over WAV payloads — the acoustic
    twin of :func:`dhash_images` (the Chromaprint/Shazam family's core
    trick at its smallest): parse the REAL RIFF bytes (mono 16-bit PCM,
    data chunk at offset 36, samples little-endian signed), split the
    samples into ``AFP_FRAMES`` frames, sum |amplitude| per frame, and
    set bit ``f`` iff ``energy(f+1) > energy(f)`` — a 30-bit fingerprint
    (the last delta is dropped so 3 × 10-bit banding divides evenly)
    that drops straight into
    :func:`~pyveb_spark.operators.dedup.hamming_pairs`' pigeonhole
    banding. Returns ``(id_col, afp)``.

    Re-encoded/resampled copies move a few frame energies slightly →
    small Hamming distance; the banding makes the all-pairs search one
    band-keyed shuffle corpus-wide. Arrow-batched mapInPandas kernel
    (byte parsing is the one place Python is unavoidable); output rows
    are (id, int64) — the payload never shuffles."""
    out_schema = f"{id_col} long, afp long"
    frame_len = AFP_SAMPLES // AFP_FRAMES

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("fingerprint_audio expects WAV payloads")
                if b[36:40] != b"data":
                    raise ValueError("expected data chunk at offset 36")
                n = int.from_bytes(b[40:44], "little") // 2
                if n < AFP_SAMPLES:
                    raise ValueError(f"need >= {AFP_SAMPLES} samples, got {n}")
                import numpy as np

                samples = np.frombuffer(
                    b, dtype="<i2", count=AFP_SAMPLES, offset=44
                ).astype(np.int64)
                energies = (
                    np.abs(samples).reshape(AFP_FRAMES, frame_len).sum(axis=1)
                )
                rising = energies[1 : AFP_BITS + 1] > energies[:AFP_BITS]
                v = int((rising << np.arange(AFP_BITS, dtype=np.int64)).sum())
                ids.append(int(i))
                fps.append(v)
            yield pd.DataFrame({id_col: ids, "afp": fps})

    return df.mapInPandas(_fp, schema=out_schema)
