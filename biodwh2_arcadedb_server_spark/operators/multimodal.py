"""Multimodal column plumbing (C5): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch iteration via ``mapInPandas`` — and since round 6
the DECODE is real too for the self-describing formats a pure-Python
environment can parse: **PPM (P6) images** (header parse + pixel
stats) and **PCM WAV audio** (stdlib ``wave`` + sample stats). The
test corpus encodes genuine PPM/WAV payloads deterministically from
the documents table, so decode output is oracle-able. Round 9 closes
the seam for a REAL compressed codec with zero new dependencies:
**PNG** (8-bit truecolor, zlib inflate + full per-scanline
None/Sub/Up/Average/Paeth unfiltering, chunk CRC verification);
round 10 the palette/sub-byte/16-bit/Adam7 variants; round 14 the
LOSSY side: **baseline JPEG** (``operators.jpeg`` — T.81 sequential
DCT: canonical Huffman from any DHT, byte unstuffing, restart
markers, DC prediction, dequant + exact float64 IDCT, 4:2:0
upsampling, YCbCr→RGB) — and later in round 14 **progressive JPEG**
(T.81 Annex G multi-scan accumulation, ``jpeg.decode`` dispatches on
the SOF marker) plus the **MP4 and Ogg/Opus CONTAINER layers**
(``operators.isobmff`` — box walk, moov metadata, stsc×stco×stsz
sample ranges, mdat frame slicing; ``operators.ogg`` — CRC-verified
page parse, 255-byte lacing reassembly across pages, OpusHead/Tags).
What remains behind the clearly-marked NotImplementedError seam is
exactly the DSP codec layer (H.264/HEVC sample decode, Opus
SILK/CELT) — that is where pyav / libopus / soundfile plug in on a
real deployment; the dispatch, schema, and batch shape they inherit
are exercised by the PPM/PNG/JPEG/WAV/MP4/Ogg paths.
``decode_stub=True`` keeps the old byte-statistics fake for
comparison and for payloads of unknown type.

Design for 100 TB of media:
- Binary payloads ride in Parquet as ``BinaryType`` next to their
  metadata struct — column pruning means metadata-only queries never
  read the bytes.
- ``mapInPandas`` streams Arrow record batches; peak executor memory
  is one batch of payloads, not one partition
  (spark.sql.execution.arrow.maxRecordsPerBatch controls batch rows).
- Feature extraction emits fixed-size vectors → downstream joins and
  ANN run on the small feature table, never re-reading media bytes.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, mime: string, width: int, height: int>"
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, byte_mean double, byte_entropy_proxy double"

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_mean double"


def _spread_media(media: DataFrame) -> DataFrame:
    """Decode-side twin of `_media_rows`'s spread: feature/frame
    extraction over a media table built by JVM expressions (PPM) or
    read from storage inherits the SCAN's parallelism — one local row
    group = one task running the whole Python decode serially. No-op
    when the input already has >= cores partitions (real corpora),
    and a no-op after `_media_rows` already spread the builder."""
    from biodwh2_arcadedb_server_spark.operators.curation import _spread

    return _spread(media, "doc_id")


def _media_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, text) input to every media builder, spread across the
    cluster when the scan under-parallelizes (optimization r14, guide
    §2.5 input skew / §4). The encode→decode chain is NARROW (no
    exchange between the two Python stages), so a single-row-group
    local parquet file serializes the whole pure-Python codec path
    into ONE task (q194 measured: task_sec ≈ wall — 3.0s serial).
    `_spread` repartitions by doc_id only when the scan yields fewer
    partitions than cores; on a real corpus the scan already has
    ≥ cores splits and this is a no-op — same contract as the
    curation/dedup gram stages."""
    from biodwh2_arcadedb_server_spark.operators.curation import _spread

    return _spread(documents.select("doc_id", "text"), "doc_id")

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, rms double, peak double"
)

PPM_W, PPM_H = 8, 8  # test-corpus image geometry (8x8 RGB = 192 px bytes)


def to_media_table(documents: DataFrame, width: int = PPM_W, height: int = PPM_H) -> DataFrame:
    """Build a media table of REAL P6 PPM images from the documents
    table: ``P6\\n<w> <h>\\n255\\n`` header + w*h*3 pixel bytes drawn
    deterministically from the document text (padded with 'x').
    Pixel contract (ADVICE r9): byte[i] = codepoint(char[i]) % 256 —
    for a pure-ASCII row that is exactly the UTF-8 encode (the cheap
    fast path below); non-ASCII rows take the explicit per-character
    codepoint fold, so the decoded-stat oracle (``ord(...) % 256`` in
    DuckDB) holds for ARBITRARY corpora, not just ASCII. Entirely
    JVM-side expressions — no Python in the encode path — so the scan
    prunes and pushes down like any other binary column."""
    n_px = width * height * 3
    # NULL text encodes as the all-padding image, deliberately
    # (ADVICE r10: without the coalesce a NULL text fell through the
    # when/otherwise into the codepoint fold, whose array_join drops
    # the null chars and silently emits a header-only 0-pixel PPM)
    padded = F.rpad(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, n_px), n_px, "x"
    )
    # char(cp % 256) re-encoded ISO-8859-1 maps each codepoint to the
    # single byte cp % 256 (Latin-1 is the identity on 0..255)
    cp_bytes = F.encode(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(n_px)),
                lambda i: F.char(F.ascii(padded.substr(i, F.lit(1))) % 256),
            ),
            "",
        ),
        "ISO-8859-1",
    )
    pixels = F.when(
        # octet_length == char count ⟺ every char is one UTF-8 byte
        # (ASCII) — the common corpus takes the zero-overhead path
        F.octet_length(padded) == n_px,
        F.encode(padded, "UTF-8"),
    ).otherwise(cp_bytes)
    header = F.encode(F.lit(f"P6\n{width} {height}\n255\n"), "UTF-8")
    payload = F.concat(header, pixels)
    return documents.select(
        "doc_id",
        F.lit("image/ppm").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
        ).alias("meta"),
    )


def to_audio_table(documents: DataFrame, sample_rate: int = 8000, n_samples: int = 64) -> DataFrame:
    """Build a media table of REAL 16-bit mono PCM WAV payloads:
    sample[i] = (byte_i - 97) * 256 over the first ``n_samples`` text
    bytes (padded with 'x'), written through the stdlib ``wave``
    encoder inside mapInPandas — genuine RIFF headers, so the decode
    path exercises a real container parse."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                # codepoint % 256 per CHARACTER (not UTF-8 bytes):
                # matches the DuckDB oracle's ord() fold on arbitrary
                # corpora, identical to the old byte fold on ASCII
                # (ADVICE r9)
                raw = [
                    ord(c) % 256
                    for c in (text[:n_samples] + "x" * n_samples)[:n_samples]
                ]
                # wrap to int16 (codepoints ≥ 226 would overflow the
                # PCM sample width); the oracle applies the same wrap
                samples = struct.pack(
                    f"<{len(raw)}h",
                    *[
                        ((b - 97) * 256 + 32768) % 65536 - 32768
                        for b in raw
                    ],
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary P6 PPM: magic, whitespace-separated width /
    height / maxval, single whitespace, then w*h*3 raw RGB bytes.
    Raises ValueError on malformed input (error-tolerant callers can
    catch per-row; the ETL posture is fail-loud)."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    # tokenize the header: three ASCII ints after the magic,
    # whitespace-separated (comments '#' not in our corpus but cheap
    # to skip for real-world files)
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    pixels = payload[pos : pos + need]
    if len(pixels) != need:
        raise ValueError(f"truncated pixel data: {len(pixels)} < {need}")
    return w, h, pixels


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import binascii
    import struct

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
    )


def _encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB bytes as a REAL (stdlib-only) 8-bit truecolor
    PNG: zlib-deflated scanlines, each prefixed with a filter byte.
    Row r uses filter type r % 5, so a corpus taller than 4 rows
    exercises EVERY unfilter path (None/Sub/Up/Average/Paeth) in the
    decoder — the point of the fixture."""
    import struct
    import zlib

    bpp, stride = 3, width * 3
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride:(r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - left
            elif ft == 2:
                v = row[i] - prev[i]
            elif ft == 3:
                v = row[i] - (left + prev[i]) // 2
            else:
                v = row[i] - _paeth(left, prev[i], ul)
            raw.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _encode_png_palette(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB bytes as a REAL indexed-color (palette) PNG —
    color type 3, the most common web PNG flavor (VERDICT r9 next #6):
    a PLTE chunk holds the distinct RGB triples (≤256 — fixture images
    are 8×8, 64 pixels), scanlines carry one palette INDEX byte per
    pixel (bpp=1 for filtering), row r uses filter r % 5 so every
    unfilter path runs against the 1-byte pixel stride too."""
    import struct
    import zlib

    triples = [
        pixels[i:i + 3] for i in range(0, width * height * 3, 3)
    ]
    palette = sorted(set(triples))
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors — palette PNG holds ≤256"
        )
    index_of = {t: i for i, t in enumerate(palette)}
    indices = bytes(index_of[t] for t in triples)
    raw = _filter_rows(indices, width, height, 1)  # bpp=1 index bytes
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", b"".join(palette))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _filter_rows(
    pixels: bytes, width: int, height: int, bpp: int
) -> bytearray:
    """Apply PNG row filters (row r gets type r %% 5, so every
    unfilter path is exercised) over a raster of ``width`` pixels ×
    ``bpp`` bytes — shared by the straight, Adam7-pass and 16-bit
    encoders."""
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride:(r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - left
            elif ft == 2:
                v = row[i] - prev[i]
            elif ft == 3:
                v = row[i] - (left + prev[i]) // 2
            else:
                v = row[i] - _paeth(left, prev[i], ul)
            raw.append(v & 0xFF)
        prev = row
    return raw


def _encode_png_adam7(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB bytes as an Adam7-INTERLACED truecolor PNG
    (round 10 — the last deterministic PNG variant behind the seam):
    the raster splits into the seven §2.6 sub-images, each filtered
    independently (filters still cycle r %% 5 within a pass), all
    passes deflate as one IDAT stream."""
    import struct
    import zlib

    bpp = 3
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub = bytearray()
        for j in range(ph):
            for i in range(pw):
                src = ((y0 + j * dy) * width + (x0 + i * dx)) * bpp
                sub += pixels[src:src + bpp]
        raw += _filter_rows(bytes(sub), pw, ph, bpp)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _encode_png_sub_byte(
    samples: list[int],
    width: int,
    height: int,
    depth: int,
    ctype: int = 0,
    palette: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode 1/2/4-bit samples (gray ctype 0, or palette indices
    ctype 3 with ``palette`` as packed RGB triples) — rows pack
    MSB-first with zero pad, filters run over the packed bytes
    (bpp=1), optional Adam7 (each pass packs its own rows)."""
    import struct
    import zlib

    if depth not in (1, 2, 4):
        raise ValueError(f"sub-byte depth must be 1/2/4, got {depth}")
    if len(samples) != width * height:
        raise ValueError(
            f"{len(samples)} samples for a {width}x{height} image"
        )
    if not interlace:
        packed_rows = [
            bytes(_pack_bits(samples[r * width:(r + 1) * width], depth))
            for r in range(height)
        ]
        raw = _filter_rows(
            b"".join(packed_rows), len(packed_rows[0]), height, 1
        )
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows = []
            for j in range(ph):
                rows.append(bytes(_pack_bits(
                    [
                        samples[(y0 + j * dy) * width + (x0 + i * dx)]
                        for i in range(pw)
                    ],
                    depth,
                )))
            raw += _filter_rows(b"".join(rows), len(rows[0]), ph, 1)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, ctype, 0, 0, int(interlace)
    )
    chunks = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG needs its PLTE triples")
        chunks += _png_chunk(b"PLTE", palette)
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _encode_png_gray16(
    samples: list[int], width: int, height: int
) -> bytes:
    """Encode 16-bit samples as a grayscale depth-16 PNG (color type
    0) — big-endian sample pairs, filters over the 2-byte pixel
    stride."""
    import struct
    import zlib

    if len(samples) != width * height:
        raise ValueError(
            f"{len(samples)} samples for a {width}x{height} image"
        )
    pixels = b"".join(struct.pack(">H", s & 0xFFFF) for s in samples)
    raw = _filter_rows(pixels, width, height, 2)
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_scanlines(
    raw: bytes, width: int, height: int, bpp: int, offset: int = 0
) -> tuple[bytearray, int]:
    """Undo PNG row filters (None/Sub/Up/Average/Paeth, RFC 2083 §6)
    over ``height`` scanlines of ``width`` pixels × ``bpp`` bytes,
    starting at ``offset`` into the inflated stream. Returns the
    reconstructed pixel bytes and the next offset (Adam7 passes call
    this once per pass — each pass is filtered independently)."""
    stride = width * bpp
    need = height * (stride + 1)
    if len(raw) - offset < need:
        raise ValueError(
            f"inflated scanline data {len(raw) - offset} < {need}"
        )
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        base = offset + r * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ft not in (0, 1, 2, 3, 4):
            raise ValueError(f"bad PNG filter type {ft} on row {r}")
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                line[i] = (line[i] + left) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
            elif ft == 4:
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        prev = bytes(line)
        out += line
    return out, offset + need


# Adam7 pass grid (RFC 2083 §2.6): (x0, y0, dx, dy) per pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# Valid (color type → sample depths) combinations, RFC 2083 §6.1.
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
    4: (8, 16), 6: (8, 16),
}


def _unpack_bits(row: bytes, width: int, depth: int) -> bytearray:
    """Unpack a sub-byte scanline (1/2/4-bit samples, MSB-first with
    trailing pad bits) into one sample per byte."""
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray(width)
    for i in range(width):
        out[i] = (
            row[i // per_byte] >> (8 - depth * (i % per_byte + 1))
        ) & mask
    return out


def _pack_bits(samples, depth: int) -> bytearray:
    """Pack sub-byte samples into a scanline (MSB-first, zero pad)."""
    per_byte = 8 // depth
    out = bytearray((len(samples) * depth + 7) // 8)
    for i, s in enumerate(samples):
        out[i // per_byte] |= (s & ((1 << depth) - 1)) << (
            8 - depth * (i % per_byte + 1)
        )
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG with nothing but the stdlib: chunk walk with CRC
    verification, IDAT concatenation + zlib inflate, per-scanline
    unfiltering (None/Sub/Up/Average/Paeth), PLTE expansion for color
    type 3 (indexed — the most common web PNG flavor; round 10),
    Adam7 DEINTERLACING (each pass unfiltered independently, pixels
    scattered back on the §2.6 grid), and 8- or 16-bit sample depth
    (16-bit samples return as big-endian byte pairs). Returns
    (width, height, channels, raw pixel bytes) — channels counts
    SAMPLES per pixel (gray 1, gray+alpha 2, RGB 3, RGBA 4; palette
    expands to 3), sub-byte grayscale scales to 8-bit full range.
    This closes the C5 compressed-codec seam for EVERY spec-valid PNG
    shape (all five color types, depths 1/2/4/8/16, both interlace
    methods) — the remaining NotImplementedError seam is only the
    genuinely lossy codecs (JPEG/MP4/Opus) in extract_features."""
    import binascii
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG (signature {payload[:8]!r})")
    pos, idat = 8, bytearray()
    w = h = channels = None
    ctype = depth = interlace = None
    plte: bytes | None = None
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if binascii.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if ctype not in _PNG_DEPTHS:
                raise ValueError(f"bad PNG color type {ctype}")
            if depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(
                    f"depth {depth} invalid for color type {ctype} "
                    f"(spec allows {_PNG_DEPTHS[ctype]})"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            # filtering operates on the ENCODED pixel width: one
            # index byte for palette images, samples × depth/8 else
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        elif tag == b"PLTE":
            if ln % 3:
                raise ValueError(f"PLTE length {ln} not divisible by 3")
            plte = bytes(data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing its PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if depth >= 8:
        bpp = channels * (depth // 8)
        if not interlace:
            out, end = _unfilter_scanlines(raw, w, h, bpp)
            if end != len(raw):
                raise ValueError(
                    f"inflated scanline data {len(raw)} != {end}"
                )
        else:
            # Adam7: seven independently-filtered sub-images scatter
            # back onto the full raster (progressive rendering's cost)
            out = bytearray(w * h * bpp)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                sub, off = _unfilter_scanlines(raw, pw, ph, bpp, off)
                for j in range(ph):
                    for i in range(pw):
                        src = (j * pw + i) * bpp
                        dst = ((y0 + j * dy) * w + (x0 + i * dx)) * bpp
                        out[dst:dst + bpp] = sub[src:src + bpp]
            if off != len(raw):
                raise ValueError(
                    f"inflated scanline data {len(raw)} != {off}"
                )
    else:
        # sub-byte depths (1/2/4-bit gray or palette — round 10, the
        # last PNG variant): filters act on the PACKED scanline bytes
        # (bpp rounds up to 1 per §6.2); samples unpack MSB-first
        # after unfiltering, per scanline (and per Adam7 pass — each
        # pass pads its own rows)
        if not interlace:
            stride = (w * depth + 7) // 8
            packed, end = _unfilter_scanlines(raw, stride, h, 1)
            if end != len(raw):
                raise ValueError(
                    f"inflated scanline data {len(raw)} != {end}"
                )
            out = bytearray()
            for r in range(h):
                out += _unpack_bits(
                    packed[r * stride:(r + 1) * stride], w, depth
                )
        else:
            out = bytearray(w * h)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                pstride = (pw * depth + 7) // 8
                packed, off = _unfilter_scanlines(
                    raw, pstride, ph, 1, off
                )
                for j in range(ph):
                    rowsamp = _unpack_bits(
                        packed[j * pstride:(j + 1) * pstride], pw, depth
                    )
                    for i in range(pw):
                        out[(y0 + j * dy) * w + (x0 + i * dx)] = rowsamp[i]
            if off != len(raw):
                raise ValueError(
                    f"inflated scanline data {len(raw)} != {off}"
                )
        if ctype == 0:
            # grayscale sub-byte samples scale to 8-bit full range
            # (§7.2: 1-bit 1 → 255, 2-bit 3 → 255, 4-bit 15 → 255)
            mx = (1 << depth) - 1
            out = bytearray(s * 255 // mx for s in out)
    if ctype == 3:
        # expand palette indices to RGB triples (RFC 2083 §4.1.2)
        n_colors = len(plte) // 3
        if out and max(out) >= n_colors:
            raise ValueError(
                f"palette index {max(out)} ≥ palette size {n_colors}"
            )
        rgb = bytearray(len(out) * 3)
        for i, idx in enumerate(out):
            rgb[i * 3:i * 3 + 3] = plte[idx * 3:idx * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, channels, bytes(out)


def to_png_table(documents: DataFrame, width: int = PPM_W, height: int = PPM_H) -> DataFrame:
    """Build a media table of REAL deflate-compressed PNGs whose pixel
    bytes are the SAME deterministic text-derived bytes as
    ``to_media_table``'s PPMs — byte[i] = codepoint(char[i]) % 256
    (ADVICE r9: the codepoint fold, not UTF-8 bytes, so the shared
    decoded-stat oracle holds for non-ASCII corpora too) — encoded
    through mapInPandas (zlib is Python-side; Arrow batches bound
    memory like every other media op)."""
    n_px = width * height * 3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _encode_png(
                    bytes(
                        ord(c) % 256
                        for c in (text[:n_px] + "x" * n_px)[:n_px]
                    ),
                    width, height,
                )
                for text in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def to_png_palette_table(
    documents: DataFrame, width: int = PPM_W, height: int = PPM_H
) -> DataFrame:
    """Build a media table of REAL indexed-color (palette) PNGs —
    color type 3, the most common web PNG flavor — carrying the same
    codepoint %% 256 pixel contract as ``to_png_table``/the PPMs, so
    all three media fixtures share one decoded-stat oracle. Encoded
    through mapInPandas like every other Python-side media op."""
    n_px = width * height * 3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _encode_png_palette(
                    bytes(
                        ord(c) % 256
                        for c in (text[:n_px] + "x" * n_px)[:n_px]
                    ),
                    width, height,
                )
                for text in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def to_png_adam7_table(
    documents: DataFrame, width: int = PPM_W, height: int = PPM_H
) -> DataFrame:
    """Build a media table of Adam7-INTERLACED truecolor PNGs carrying
    the same codepoint %% 256 pixel contract as the other media
    fixtures — the deinterlacing decode path shares their decoded-stat
    oracle."""
    n_px = width * height * 3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _encode_png_adam7(
                    bytes(
                        ord(c) % 256
                        for c in (text[:n_px] + "x" * n_px)[:n_px]
                    ),
                    width, height,
                )
                for text in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def to_jpeg_table(
    documents: DataFrame,
    width: int = 16,
    height: int = 16,
    progressive: bool = False,
) -> DataFrame:
    """Build a media table of REAL BASELINE JPEGs (round 14, VERDICT
    r13 #5 — the [C5] lossy-codec seam closed with zero new
    dependencies: ``operators.jpeg`` is a pure-python/numpy T.81
    baseline codec). The fixture uses the DC-EXACT construction:
    grayscale, each 8×8 block FLAT at ``codepoint(char_b) % 256``
    over the first (width/8)·(height/8) text chars (padded 'x'), and
    an all-8 quantization table. A flat block has only a DC
    coefficient and 8·(v−128) is always divisible by 8, so
    quantize→dequantize→IDCT reproduces every block bit-exactly —
    a LOSSY format with a LOSSLESS fixture path, which is what lets
    the decoded-stat oracle hash-check the full Huffman+DCT decode
    chain (per-block values are the oracle's ``ord(char) % 256``).

    ``progressive=True`` emits SOF2 streams instead (same DC-exact
    pixel contract): interleaved DC-first + banded AC + successive-
    approximation refinement scans, so the q198 oracle hash-checks
    the full Annex-G scan accumulation path."""
    import numpy as np

    from biodwh2_arcadedb_server_spark.operators import jpeg as jpeg_mod

    bx, by = width // 8, height // 8
    n_blocks = bx * by
    q8 = np.full(64, 8, dtype=np.int64)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                chars = ((text or "")[:n_blocks] + "x" * n_blocks)[:n_blocks]
                vals = np.array(
                    [ord(c) % 256 for c in chars], dtype=np.uint8
                ).reshape(by, bx)
                img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                payloads.append(
                    jpeg_mod.encode_progressive(img, qtables=(q8, q8))
                    if progressive
                    else jpeg_mod.encode_baseline(img, qtables=(q8, q8))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/jpeg",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Per-item features from binary payloads via mapInPandas (Arrow
    batches in, Arrow batches out — the sanctioned Python path).

    ``decode_stub=False`` (the real path) dispatches on ``media_type``:
    ``image/ppm`` payloads are DECODED (header parse + pixel extract)
    and the features computed over the pixel bytes; any other type
    raises NotImplementedError naming the seam where a compressed-
    format decoder (PIL / soundfile / pyav) plugs in. The stub keeps
    the old whole-payload byte statistics."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                payloads = pdf["payload"]
                n_bytes = payloads.map(len)
                byte_mean = payloads.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
                entropy = payloads.map(lambda b: (len(set(b)) / 256.0) if len(b) else 0.0)
            else:
                n_bytes, byte_mean, entropy = [], [], []
                for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                    if mt == "image/ppm":
                        _, _, px = _decode_ppm(bytes(payload))
                    elif mt == "image/png":
                        _, _, _, px = _decode_png(bytes(payload))
                    elif mt == "image/jpeg":
                        from biodwh2_arcadedb_server_spark.operators import (
                            jpeg as jpeg_mod,
                        )

                        # dispatches baseline vs progressive on SOF
                        px = jpeg_mod.decode(bytes(payload)).tobytes()
                    else:
                        raise NotImplementedError(
                            f"no pure-Python decoder for {mt!r} — plug "
                            "PIL.Image.open / soundfile.read in here"
                        )
                    n_bytes.append(len(px))
                    byte_mean.append(sum(px) / len(px) if px else 0.0)
                    entropy.append(len(set(px)) / 256.0 if px else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(n_bytes, dtype="int64"),
                    "byte_mean": pd.array(byte_mean, dtype="float64"),
                    "byte_entropy_proxy": pd.array(entropy, dtype="float64"),
                }
            )

    return _spread_media(media).mapInPandas(op, schema=FEATURE_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode via the stdlib ``wave`` container parser:
    sample rate and frame count from the RIFF header, RMS and peak
    from the 16-bit PCM samples. mapInPandas batch shape identical to
    ``extract_features`` — this is the audio leg of the C5 seam,
    closed for uncompressed PCM."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rates, counts, rmss, peaks = [], [], [], []
            for payload in pdf["payload"]:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise NotImplementedError(
                            "only 16-bit mono PCM decoded here — "
                            "soundfile.read plugs in for the rest"
                        )
                    n = w.getnframes()
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                rates.append(w.getframerate())
                counts.append(n)
                rmss.append((sum(s * s for s in samples) / n) ** 0.5 if n else 0.0)
                peaks.append(float(max(abs(s) for s in samples)) if n else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": pd.array(counts, dtype="int64"),
                    "rms": pd.array(rmss, dtype="float64"),
                    "peak": pd.array(peaks, dtype="float64"),
                }
            )

    return _spread_media(media).mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling shape for media payloads: one output row per
    sampled 'frame' (the 1→N mapInPandas fan-out).

    Real path (``decode_stub=False``): a decoded ``image/ppm`` or
    ``image/jpeg`` payload (round 14: baseline AND progressive, via
    ``jpeg.decode``'s SOF dispatch) yields one frame per pixel ROW —
    ``frame_bytes`` = the row stride, ``frame_mean`` = the row's
    pixel mean — i.e. actual decoded content, not byte offsets. A
    real VIDEO decoder (pyav keyframe seek) plugs into the same
    dispatch for video/* types. The stub keeps the byte-offset
    sampling with frame_mean over raw bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_mean": []}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if decode_stub:
                    n = len(payload)
                    for idx, off in enumerate(range(0, n, every_n_bytes)):
                        chunk = payload[off : off + every_n_bytes]
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(idx)
                        rows["frame_bytes"].append(len(chunk))
                        rows["frame_mean"].append(
                            sum(chunk) / len(chunk) if len(chunk) else 0.0
                        )
                    continue
                if mt == "image/ppm":
                    w, h, px = _decode_ppm(bytes(payload))
                    stride = w * 3
                elif mt == "image/jpeg":
                    # round 14 (ROADMAP follow-on): the lossy codec
                    # rides the same per-row fan-out — decode()
                    # dispatches baseline vs progressive on SOF
                    from biodwh2_arcadedb_server_spark.operators import (
                        jpeg as jpeg_mod,
                    )

                    img = jpeg_mod.decode(bytes(payload))
                    h = img.shape[0]
                    px = img.tobytes()
                    stride = len(px) // h
                else:
                    raise NotImplementedError(
                        f"no pure-Python frame decoder for {mt!r} — "
                        "pyav/ffmpeg keyframe seek plugs in here"
                    )
                for r in range(h):
                    row = px[r * stride : (r + 1) * stride]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(r)
                    rows["frame_bytes"].append(len(row))
                    rows["frame_mean"].append(sum(row) / len(row))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.array(rows["frame_idx"], dtype="int32"),
                    "frame_bytes": pd.array(rows["frame_bytes"], dtype="int64"),
                    "frame_mean": pd.array(rows["frame_mean"], dtype="float64"),
                }
            )

    return _spread_media(media).mapInPandas(op, schema=FRAME_SCHEMA)


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Metadata projection — never touches payload bytes (verify with
    .explain: ReadSchema excludes `payload`)."""
    return media.select("doc_id", "media_type", F.col("meta.n_bytes").alias("n_bytes"))


# ---------------------------------------------------------------- containers
MP4_FRAMES, MP4_FRAME_BYTES = 5, 64  # 5 8x8 gray frames per doc
OPUS_PACKET_LENS = (150, 300, 150)   # middle packet spans Ogg pages


def to_mp4_table(documents: DataFrame) -> DataFrame:
    """Build a media table of REAL MP4 files (round 14 — the [C5]
    'MP4 container' seam, ``operators.isobmff``): each document
    yields MP4_FRAMES 8×8 grayscale frames whose pixel bytes are
    ``codepoint(char) % 256`` over consecutive 64-char slices of the
    text (padded 'x'), stored as a ``raw `` visual track in chunks of
    2 samples — 5 frames ⇒ chunks of 2+2+1, so the parser's stsc
    run-length resolution (including the short trailing run) is
    exercised on every payload."""
    from biodwh2_arcadedb_server_spark.operators import isobmff

    n_chars = MP4_FRAMES * MP4_FRAME_BYTES

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                chars = ((text or "")[:n_chars] + "x" * n_chars)[:n_chars]
                raw = bytes(ord(c) % 256 for c in chars)
                frames = [
                    raw[i : i + MP4_FRAME_BYTES]
                    for i in range(0, n_chars, MP4_FRAME_BYTES)
                ]
                payloads.append(
                    isobmff.build_mp4(frames, 8, 8, samples_per_chunk=2)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video/mp4",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def mp4_frames(media: DataFrame) -> DataFrame:
    """Per-FRAME rows from MP4 payloads via the real container walk
    (1→N mapInPandas fan-out): moov metadata parse, stsc×stco×stsz
    sample resolution, mdat slicing — frame bytes are decoded for the
    ``raw `` sample entry, NotImplementedError names the pyav seam
    for compressed tracks."""
    from biodwh2_arcadedb_server_spark.operators import isobmff

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [],
                "frame_bytes": [], "frame_mean": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, frame in enumerate(
                    isobmff.decode_samples(bytes(payload))
                ):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_bytes"].append(len(frame))
                    rows["frame_mean"].append(
                        sum(frame) / len(frame) if frame else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.array(rows["frame_idx"], dtype="int32"),
                    "frame_bytes": pd.array(
                        rows["frame_bytes"], dtype="int64"
                    ),
                    "frame_mean": pd.array(
                        rows["frame_mean"], dtype="float64"
                    ),
                }
            )

    return _spread_media(media).mapInPandas(op, schema=FRAME_SCHEMA)


def to_opus_table(documents: DataFrame) -> DataFrame:
    """Build a media table of REAL Opus-in-Ogg streams (round 14 —
    the [C5] 'Opus container' seam, ``operators.ogg``): OpusHead +
    OpusTags + three audio packets of OPUS_PACKET_LENS bytes drawn
    from the text codepoints; pages are built with
    ``max_segments_per_page=2`` so the 300-byte middle packet SPANS a
    page boundary — every payload exercises the continuation-flag +
    lacing reassembly path and the Ogg CRC."""
    from biodwh2_arcadedb_server_spark.operators import ogg as ogg_mod

    n_chars = sum(OPUS_PACKET_LENS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                chars = ((text or "")[:n_chars] + "x" * n_chars)[:n_chars]
                raw = bytes(ord(c) % 256 for c in chars)
                pkts, off = [], 0
                for ln in OPUS_PACKET_LENS:
                    pkts.append(raw[off : off + ln])
                    off += ln
                payloads.append(
                    ogg_mod.build_opus_stream(
                        pkts, channels=1, max_segments_per_page=2
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/ogg",
                    "payload": payloads,
                }
            )

    return _media_rows(documents).mapInPandas(
        op, schema="doc_id long, media_type string, payload binary"
    )


def opus_packet_stats(media: DataFrame) -> DataFrame:
    """Per-PACKET rows from Opus-in-Ogg payloads via the real
    container walk (CRC-verified page parse, lacing reassembly across
    page boundaries, OpusHead metadata): one row per audio packet
    with its byte stats plus the stream's channel count and duration
    in samples. The Opus DSP decode itself stays behind
    ``ogg.decode``'s NotImplementedError."""
    from biodwh2_arcadedb_server_spark.operators import ogg as ogg_mod

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "packet_idx": [], "n_bytes": [],
                "byte_mean": [], "channels": [], "duration_samples": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                meta = ogg_mod.opus_metadata(data)
                for idx, pkt in enumerate(ogg_mod.ogg_packets(data)[2:]):
                    rows["doc_id"].append(doc_id)
                    rows["packet_idx"].append(idx)
                    rows["n_bytes"].append(len(pkt))
                    rows["byte_mean"].append(
                        sum(pkt) / len(pkt) if pkt else 0.0
                    )
                    rows["channels"].append(meta["channels"])
                    rows["duration_samples"].append(
                        meta["duration_samples"]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "packet_idx": pd.array(
                        rows["packet_idx"], dtype="int32"
                    ),
                    "n_bytes": pd.array(rows["n_bytes"], dtype="int64"),
                    "byte_mean": pd.array(
                        rows["byte_mean"], dtype="float64"
                    ),
                    "channels": pd.array(rows["channels"], dtype="int32"),
                    "duration_samples": pd.array(
                        rows["duration_samples"], dtype="int64"
                    ),
                }
            )

    return _spread_media(media).mapInPandas(
        op,
        schema=(
            "doc_id long, packet_idx int, n_bytes long, "
            "byte_mean double, channels int, duration_samples long"
        ),
    )
