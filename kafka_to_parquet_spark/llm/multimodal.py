"""Multimodal columns (X5 + north-star): media as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas code.

The container has no image/audio libraries, so decoding splits by
format: PNG, GIF (hand-rolled LZW, :func:`decode_gif`) and
uncompressed images (binary PPM/PGM, 24-bit BI_RGB BMP) decode for
REAL via :func:`decode_image` (numpy + stdlib zlib, no dependencies — pixel-exact round-trip tests in tests/test_round7.py,
driven through the same mapInPandas plumbing); codec-bound formats
(JPEG/WebP) remain explicitly stubbed (``decode_image_stub``
raises). The declared fixture queries use the deterministic fake
(the fixture's media bytes are text, not images), which is what makes
them oracle-checkable; every Spark-side piece is real and tested: the
binary column, the metadata struct, the ``mapInPandas`` batch
iterator, the explicit output schema, and the partition-parallel
execution. Swapping in PIL/ffmpeg for compressed formats changes only
the inner function body.

Scale notes: media bytes ride along as column values (parquet binary),
so partition sizing is governed by ``spark.sql.files.maxPartitionBytes``;
feature extraction is a per-row map — no shuffle; the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds executor
memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.vectors import duck_dot, norm_expr
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


def decode_image_stub(data: bytes) -> dict:
    """Placeholder for a CODEC-bound image decoder (JPEG/WebP need
    PIL/libvips, which the test container doesn't ship). PNG and the
    uncompressed formats decode for real — see :func:`decode_image`;
    the deterministic fake below stands in for plumbing tests over the
    text-byte fixture."""
    raise NotImplementedError(
        "JPEG/WebP decoding requires an imaging library not present in this "
        "environment; decode_image handles PNG/PPM/PGM/BMP for real, and "
        "fake_decode_features (deterministic) backs plumbing tests"
    )


def decode_image(data: bytes):
    """REAL image decode for the formats a no-dependency container can
    honestly parse — PNG (stdlib zlib inflate + full scanline-filter
    reconstruction, 8-bit gray/GA/RGB/RGBA), binary PPM (``P6``), binary
    PGM (``P5``), and uncompressed 24-bit BMP (``BM`` + BI_RGB) — returning
    ``(ndarray[h, w, c] uint8, width, height, channels)``. numpy +
    stdlib only; JPEG/WebP fall through to
    :func:`decode_image_stub` (the documented environment limit).
    This is the inner function a real corpus swaps into the
    q_multimodal_decode mapInPandas batch loop; tests drive it through
    that exact plumbing (tests/test_round7.py)."""
    import struct

    import numpy as np

    if data[:2] in (b"P6", b"P5"):
        # netpbm binary: ASCII header tokens (magic, w, h, maxval),
        # '#' comments allowed, one whitespace byte, then the raster.
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = tokens
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        c = 3 if data[:2] == b"P6" else 1
        raster = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=pos)
        return raster.reshape(h, w, c), w, h, c
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(data)
    if data[:2] == b"BM":
        # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: require
        # bpp=24, compression=BI_RGB(0); rows bottom-up, 4-byte padded,
        # pixels stored BGR.
        off = struct.unpack_from("<I", data, 10)[0]
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        comp = struct.unpack_from("<I", data, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
        flipped = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flipped:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy(), w, h, 3  # BGR -> RGB
    return decode_image_stub(data)


def _gif_lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, Clear resets the table, widths grow at table size
    2^width (capped at 12 bits), including the KwKwK case (a code one
    past the table end decodes as prev + prev[0])."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(1 << min_code_size)] + [[], []]
        width = min_code_size + 1

    width = 0
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]  # KwKwK
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + [entry[0]])
            # >= (not ==): for nonconforming min_code_size=1 streams
            # the table already equals 2^width at reset, so the append
            # above lands past the boundary and equality never fires.
            while len(table) >= (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) >= n_expected:
                return out
    return out


def decode_gif(data: bytes):
    """REAL GIF decode (GIF87a/89a): global/local color tables and a
    hand-rolled GIF-LZW inflater (variable code width, Clear/EOI,
    KwKwK) — no codec libraries. Returns ``(frames ndarray[n, h, w, 3]
    uint8, w, h)`` with every image block decoded through its own
    palette; frames are returned RAW (no disposal compositing — a
    feature-extraction pipeline hashes/samples frames, it doesn't
    re-render the animation). Interlaced images are rejected loudly."""
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF stream")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x} at {pos}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        lzw = b""
        while data[pos]:
            lzw += data[pos + 1 : pos + 1 + data[pos]]
            pos += 1 + data[pos]
        pos += 1
        idx = _gif_lzw_decode(min_code, lzw, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data truncated")
        frame = pal[np.array(idx[: iw * ih], np.int32)].reshape(ih, iw, 3)
        frames.append((ix, iy, frame))
    if not frames:
        raise ValueError("GIF stream has no image blocks")
    # Return full-canvas frames for uniform shape; sub-rect frames are
    # placed on a zero canvas at their offsets (raw, no disposal).
    out = np.zeros((len(frames), h, w, 3), np.uint8)
    for i, (ix, iy, fr) in enumerate(frames):
        out[i, iy : iy + fr.shape[0], ix : ix + fr.shape[1]] = fr
    return out, w, h


def probe_image(data: bytes):
    """Header-only format/dimension sniff — the ``identify`` primitive
    a pipeline runs BEFORE any decode (dimension/aspect filters drop
    most junk without touching pixel data). Returns
    ``(format, width, height)``. Works for JPEG too (SOF-marker walk —
    dimensions live in the frame header, no entropy decode needed),
    plus PNG/GIF/BMP/PPM/PGM. Unknown magic raises ValueError: a probe
    must never guess."""
    import struct

    if data[:3] == b"\xff\xd8\xff":
        # JPEG: walk markers; SOFn (C0-CF except C4/C8/CC) carries
        # [precision u8][height u16][width u16].
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker in (0xDA, 0xD9):
                # SOS/EOI before any SOF: stop the walk — past SOS lies
                # entropy-coded data where stuffed 0xFF bytes would be
                # misread as markers and yield garbage dimensions.
                break
            seg_len = struct.unpack_from(">H", data, pos + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return "jpeg", w, h
            pos += 2 + seg_len
        raise ValueError("JPEG stream has no SOF frame header")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", data, 16)  # IHDR is always first
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return "gif", w, h
    if data[:2] == b"BM":
        w, h = struct.unpack_from("<ii", data, 18)
        return "bmp", w, abs(h)
    if data[:2] in (b"P6", b"P5"):
        # header-only token walk (same grammar as decode_image, but
        # stops after w/h — never touches the raster)
        pos, tokens = 2, []
        while len(tokens) < 2 and pos < len(data):
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
        if len(tokens) < 2:
            raise ValueError("truncated netpbm header")
        return ("ppm" if data[:2] == b"P6" else "pgm"), tokens[0], tokens[1]
    raise ValueError(f"unknown image magic {data[:8]!r}")


def probe_media(data: bytes):
    """Kind-routing probe for mixed-media corpora: classify a payload
    by magic and return ``(kind, format, meta)`` where meta is a small
    dict — images get width/height (header-only, incl. JPEG), WAV gets
    channels/rate, Y4M gets width/height/fps. The dispatch step a
    multimodal pipeline runs on an untyped binary column before
    routing batches to the per-kind decoders. Unknown magic raises —
    a router that guesses poisons every downstream partition."""
    import struct

    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            if cid == b"fmt ":
                _fmt, n_ch, rate = struct.unpack_from("<HHI", data, pos + 8)
                return "audio", "wav", {"channels": n_ch, "rate": rate}
            pos += 8 + size + (size & 1)
        raise ValueError("WAV stream has no fmt chunk")
    if data.startswith(b"YUV4MPEG2"):
        hdr = data[9 : data.index(b"\n")]
        meta = {}
        for tok in hdr.split():
            t = tok.decode()
            if t[0] == "W":
                meta["width"] = int(t[1:])
            elif t[0] == "H":
                meta["height"] = int(t[1:])
            elif t[0] == "F":
                num, den = t[1:].split(":")
                meta["fps_num"], meta["fps_den"] = int(num), int(den)
        return "video", "y4m", meta
    fmt, w, h = probe_image(data)  # raises ValueError on unknown magic
    return "image", fmt, {"width": w, "height": h}


def _decode_png(data: bytes):
    """PNG decode with stdlib zlib + numpy: 8-bit depth, color types
    gray(0)/RGB(2)/gray+alpha(4)/RGBA(6), no interlace. All five scanline
    filters (None/Sub/Up/Average/Paeth) are reconstructed per spec —
    verified in tests against an independent per-pixel reference
    implementation. Palette/16-bit/interlaced variants are rejected
    loudly rather than mis-decoded."""
    import struct
    import zlib

    import numpy as np

    pos = 8
    w = h = None
    channels = None
    idat = b""
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(
                    f"only 8-bit non-interlaced gray/RGB/GA/RGBA PNG supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if w is None or channels is None:
        raise ValueError("PNG stream missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has unexpected length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[x] + pred
                cur[x] = val & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, channels), w, h, channels


def decode_audio(data: bytes):
    """REAL audio decode for canonical RIFF/WAVE PCM (the WAV files a
    data pipeline actually meets are overwhelmingly 16-bit PCM):
    returns ``(ndarray[n_frames, channels] int16, sample_rate)``.
    numpy + struct only; compressed codecs (MP3/AAC/OGG) raise
    NotImplementedError like the compressed-image path — the same
    documented environment limit, the same one-function swap point."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio decoding requires a codec library not present "
            "in this environment; decode_audio handles RIFF/WAVE PCM for real"
        )
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only 16-bit PCM WAV supported (fmt={audio_fmt}, bits={bits})"
                )
            fmt = (n_ch, rate)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n_ch, rate = fmt
            frames = np.frombuffer(
                data, dtype="<i2", count=size // 2, offset=body
            ).reshape(-1, n_ch)
            return frames, rate
        pos = body + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WAV stream has no data chunk")


def decode_video(data: bytes):
    """REAL video decode for YUV4MPEG2 (``.y4m``) — the canonical
    UNCOMPRESSED video container every codec toolchain reads/writes —
    returning ``(y_frames ndarray[n, h, w] uint8, w, h, fps_num,
    fps_den)``. The Y (luma) plane is returned per frame — the input
    every frame-level pipeline feature (sampling, scene-cut deltas,
    perceptual hashes) consumes; chroma planes are parsed/skipped by
    subsampling mode (C420*/C422/C444). numpy-only; compressed
    containers (MP4/WebM) raise NotImplementedError — same environment
    limit, same swap point as the image/audio paths."""
    import numpy as np

    if not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "compressed video decoding requires a codec library not present "
            "in this environment; decode_video handles YUV4MPEG2 for real"
        )
    hdr_end = data.index(b"\n")
    w = h = None
    fps_num, fps_den = 0, 1
    chroma = "420"
    for tok in data[9:hdr_end].split():
        t = tok.decode()
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fps_num, fps_den = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            chroma = t[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    # Validate dimension parity per chroma mode BEFORE iterating: w//2
    # on an odd dimension would silently floor, drifting the frame
    # cursor into a misleading "expected FRAME marker" error downstream.
    if chroma.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError(
                f"Y4M C420 requires even dimensions, got {w}x{h}"
            )
        chroma_bytes = (w // 2) * (h // 2) * 2
    elif chroma.startswith("422"):
        if w % 2:
            raise ValueError(f"Y4M C422 requires even width, got {w}")
        chroma_bytes = (w // 2) * h * 2
    elif chroma.startswith("444"):
        chroma_bytes = w * h * 2
    else:
        raise ValueError(f"unsupported Y4M chroma mode C{chroma}")
    frames = []
    pos = hdr_end + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # frame params (if any) end at \n
        y = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=pos)
        frames.append(y.reshape(h, w))
        pos += w * h + chroma_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), w, h, fps_num, fps_den


def frame_ahash(frames):
    """Perceptual average-hash per frame: downsample each Y plane to
    8×8 by block means, threshold at the frame's 64-cell mean, pack to
    one uint64 — the classic aHash. Near-duplicate CLIPS then reduce
    to Hamming distance over small integer sets, which plugs straight
    into the SimHash banded-LSH machinery (q_dedup_simhash_pairs'
    (band, value) join) — the perceptual complement of
    q_multimodal_hashdup's exact byte-level families. numpy-only;
    input is decode_video's ``[n, h, w] uint8`` stack; arbitrary dims
    >= 8x8 are area-mean resampled to the 8x8 grid (divisible dims take
    the exact reshape fast path)."""
    import numpy as np

    n, h, w = frames.shape
    if h < 8 or w < 8:
        raise ValueError(f"frame_ahash needs frames >= 8x8, got {h}x{w}")
    if h % 8 == 0 and w % 8 == 0:
        blocks = frames.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    else:
        # area-mean resample to 8x8 for arbitrary dims: partition rows/
        # cols into 8 near-equal bins (reduceat prefix sums), divide by
        # each cell's true pixel count — the float boundaries differ
        # from the divisible fast path by < one source pixel, so hashes
        # stay stable across the two paths for divisible inputs too.
        rb = (np.arange(8) * h) // 8
        cb = (np.arange(8) * w) // 8
        rc = np.diff(np.append(rb, h)).astype(np.float64)
        cc = np.diff(np.append(cb, w)).astype(np.float64)
        f = frames.astype(np.float64)
        rowsum = np.add.reduceat(f, rb, axis=1)          # [n, 8, w]
        blocks = np.add.reduceat(rowsum, cb, axis=2)     # [n, 8, 8]
        blocks /= rc[None, :, None] * cc[None, None, :]
    bits = (blocks > blocks.mean(axis=(1, 2), keepdims=True)).reshape(n, 64)
    weights = (1 << np.arange(64, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def fake_decode_features(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decode + feature-extract: "decode"
    the payload (UTF-8) and pretend the character count encodes image
    dimensions, with the first 16 code points as a pixel sample.
    Operating on decoded characters — not raw bytes — keeps the
    function aligned with the oracles' length(text)/ascii(substr)
    semantics for non-ASCII payloads too (byte counts diverge from
    char counts the moment a multi-byte character appears)."""
    text = data.decode("utf-8")
    n = len(text)
    width = 16 + n % 64
    height = 16 + (n * 7) % 64
    mean16 = sum(ord(c) for c in text[:16]) / 16.0 if n >= 16 else 0.0
    return width, height, mean16


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-shaped as a multimodal table: an opaque binary
    payload plus a typed metadata struct — the schema a real
    image/audio corpus would have."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media_bytes"),
        F.struct(
            F.lit("fake/utf8").alias("mime"),
            F.length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


@query(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(16 + length(text) % 64 AS INTEGER)        AS width,
       CAST(16 + (length(text) * 7) % 64 AS INTEGER)  AS height,
       CASE WHEN length(text) >= 16
            THEN round(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, 17), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                 (a, b) -> a + b) / 16.0, 4)
            ELSE 0.0 END                              AS mean16
FROM documents
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5a: decode/feature-extract over a binary media column via
    mapInPandas — Arrow batches in, typed feature rows out. The decode
    itself is the deterministic fake (see module docstring), which is
    what makes this UDF path oracle-checkable: the oracle recomputes
    the same features from the text the bytes encode."""
    media = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media_bytes"].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "mean16": feats.map(lambda t: round(t[2], 4)),
                }
            )

    return media.mapInPandas(
        extract, schema="doc_id long, width int, height int, mean16 double"
    )


@query(
    "q_multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(32 AS INTEGER) AS out_w,
       CAST(32 AS INTEGER) AS out_h,
       CAST(16 + length(text) % 64 AS INTEGER) / 32.0       AS scale_x,
       CAST(16 + (length(text) * 7) % 64 AS INTEGER) / 32.0 AS scale_y,
       CAST(length(text) % 251 AS INTEGER) AS thumb_checksum
FROM documents
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5c: resize as an Arrow-batched Pandas transform — decode (fake)
    → target 32×32 → per-image scale factors + a deterministic thumb
    checksum standing in for resampled pixels. A real implementation
    swaps only the inner function for PIL's ``Image.resize``; the
    Spark plumbing (mapInPandas, explicit schema, no shuffle) is the
    part under test."""
    media = media_table(spark, sf_dir)
    target = 32

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media_bytes"].map(fake_decode_features)
            n = pdf["media_bytes"].map(lambda d: len(d.decode("utf-8")))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": target,
                    "out_h": target,
                    "scale_x": feats.map(lambda t: t[0] / target),  # /32 is exact in binary
                    "scale_y": feats.map(lambda t: t[1] / target),
                    "thumb_checksum": (n % 251).astype("int32"),
                }
            )

    return media.mapInPandas(
        resize,
        schema="doc_id long, out_w int, out_h int, scale_x double, scale_y double, thumb_checksum int",
    )


@query(
    "q_multimodal_framesample",
    oracle="""
SELECT doc_id,
       CAST(length(text) // 256 AS INTEGER) AS n_frames,
       array_to_string(
         list_transform(range(0, CAST(length(text) // 256 AS BIGINT), 4),
                        k -> CAST(ascii(substr(text, CAST(k * 256 + 1 AS INTEGER), 1)) AS INTEGER)),
         ',') AS sampled
FROM documents
WHERE length(text) >= 256
""",
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d: frame sampling over a "video" binary column — treat each
    256-byte block as a frame, keep every 4th frame's first byte as
    its (fake) decoded sample. Mirrors ffmpeg-style stride sampling:
    per-row map, output is the sampled-frame list serialized to a
    comma-joined string (scalar, so every downstream comparator can
    hash it; integers render identically in every engine) — no
    shuffle, memory bounded by the Arrow batch."""
    media = media_table(spark, sf_dir)
    frame, stride = 256, 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["media_bytes"].map(lambda d: d.decode("utf-8"))
            n_frames = (texts.map(len) // frame).astype("int32")
            sampled = [
                ",".join(str(ord(t[k * frame])) for k in range(0, nf, stride))
                for t, nf in zip(texts, n_frames)
            ]
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_frames": n_frames, "sampled": sampled}
            )
            yield out[out["n_frames"] > 0]

    return media.mapInPandas(sample, schema="doc_id long, n_frames int, sampled string")


@query(
    "q_multimodal_join",
    oracle=f"""
SELECT d.doc_id,
       d.lang,
       CAST(length(d.text) AS INTEGER)        AS text_len,
       e.label,
       CAST(len(e.embedding) AS INTEGER)      AS dim,
       round(sqrt({duck_dot('e.embedding', 'e.embedding')}), 6) AS vec_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5b: multimodal join — text meta + embedding vector travel
    through a key join; the array column is carried, not exploded, so
    the shuffle moves each vector exactly once."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        F.length("text").alias("text_len"),
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.expr(norm_expr("embedding")), 6).alias("vec_norm"),
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic media encoders (the encode side of the real
# decoders above). A corpus whose media column really contains
# PNG/GIF/WAV/Y4M bytes does not exist in the fixture (documents.text
# is prose), so q_multimodal_probe CONSTRUCTS one in-plan from doc_id
# — the q_synth_generator discipline (sources/generator.py:46) — and
# then runs the REAL decode path under the driver's oracle gate: every
# pixel/sample below is a closed-form function of doc_id that the
# DuckDB oracle recomputes without ever touching a codec.
# ---------------------------------------------------------------------------

SYNTH_KINDS = ("png", "ppm", "bmp", "gif", "wav", "y4m")
SYNTH_GIF_PAL_N = 8  # 8-entry grayscale palette, min_code_size = 3


def synth_dims(doc_id: int) -> tuple[int, int]:
    """Image dims for a doc id — mirrored by the oracle SQL."""
    return 4 + doc_id % 9, 3 + doc_id % 7


def _synth_vals(n: int, seed: int):
    """The shared value stream v_i = (31·i + 7 + seed) mod 256."""
    import numpy as np

    return ((np.arange(n, dtype=np.int64) * 31 + 7 + seed) % 256).astype(np.uint8)


def encode_ppm(arr) -> bytes:
    """Binary P6 from an (h, w, 3) uint8 array."""
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def encode_bmp(arr) -> bytes:
    """24-bit BI_RGB bottom-up BMP (rows padded to 4 bytes) from an
    (h, w, 3) RGB uint8 array."""
    import struct

    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = b"".join(
        arr[y][:, ::-1].tobytes().ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    off = 14 + 40
    return (
        struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
        + rows
    )


def encode_png(arr) -> bytes:
    """8-bit truecolor PNG, filter type 0 rows, one zlib IDAT — valid
    per spec; decode_image reconstructs through the full filter path."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif_lzw_encode(mcs: int, indices) -> bytes:
    """Standard dictionary GIF-LZW compressor (Clear first, EOI last,
    width grows after assigning code 2^width, LSB-first packing) —
    the inverse of :func:`_gif_lzw_decode`."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    codes = [(clear, width)]
    table = {(i,): i for i in range(1 << mcs)}
    next_code = eoi + 1
    buf: tuple[int, ...] = ()
    for sym in indices:
        nxt = buf + (int(sym),)
        if nxt in table:
            buf = nxt
            continue
        codes.append((table[buf], width))
        table[nxt] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            codes.append((clear, width))
            table = {(i,): i for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
        buf = (int(sym),)
    if buf:
        codes.append((table[buf], width))
    codes.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(indices, palette, w: int, h: int, mcs: int) -> bytes:
    """Single-frame GIF89a with a global color table: `indices` is an
    (h·w,) palette-index array, `palette` a list of (r, g, b)."""
    import struct

    pal_bits = max(1, (len(palette) - 1).bit_length())
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    for j in range(1 << pal_bits):
        r, g, b = palette[j] if j < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _gif_lzw_encode(mcs, indices)
    out += bytes((mcs,))
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        out += bytes((len(blk),)) + blk
    return out + b"\x00;"


def encode_wav(samples, rate: int) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE from an int16 sample array."""
    import struct

    raw = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_y4m(frames, w: int, h: int) -> bytes:
    """C420 Y4M from an (n, h, w) luma array; chroma planes neutral
    0x80 (decode_video parses geometry and returns luma only)."""
    cb = (w // 2) * (h // 2) * 2
    out = f"YUV4MPEG2 W{w} H{h} F30000:1001 Ip A1:1 C420jpeg\n".encode()
    for f in range(frames.shape[0]):
        out += b"FRAME\n" + frames[f].tobytes() + b"\x80" * cb
    return out


def synth_media(doc_id: int) -> bytes:
    """Deterministic payload for a doc id: kind = doc_id mod 6 over
    {SYNTH_KINDS}, content from the shared value stream — every
    decoded scalar is (31·i + 7 + doc_id) mod 256 (images/video),
    palette-gray((7·i + doc_id) mod 8) (GIF), or
    (777·i + 11·doc_id) mod 65536 − 32768 (WAV int16)."""
    import numpy as np

    kind = SYNTH_KINDS[doc_id % 6]
    w, h = synth_dims(doc_id)
    if kind in ("png", "ppm", "bmp"):
        arr = _synth_vals(w * h * 3, doc_id).reshape(h, w, 3)
        return {"png": encode_png, "ppm": encode_ppm, "bmp": encode_bmp}[kind](arr)
    if kind == "gif":
        idx = ((np.arange(w * h, dtype=np.int64) * 7 + doc_id) % SYNTH_GIF_PAL_N)
        pal = [((j * 40 + 5) % 256,) * 3 for j in range(SYNTH_GIF_PAL_N)]
        return encode_gif(idx, pal, w, h, 3)
    if kind == "wav":
        n = 16 + doc_id % 33
        s = ((np.arange(n, dtype=np.int64) * 777 + doc_id * 11) % 65536 - 32768)
        return encode_wav(s.astype(np.int16), 8000)
    wv, hv = 2 * (2 + doc_id % 8), 2 * (2 + doc_id % 6)
    nf = 1 + doc_id % 3
    luma = _synth_vals(nf * wv * hv, doc_id).reshape(nf, hv, wv)
    return encode_y4m(luma, wv, hv)
