"""Multimodal (image / audio / video) columns over binary data.

The reference has NO media handling (verified absence across
`/root/reference/pydala/` — binary columns pass through as opaque Arrow
``binary``); this module is part of the engine's large-scale
training-data-pipeline extension surface, built on the conventions a
100 TB multimodal corpus needs:

- media is an opaque ``binary`` column plus a typed metadata struct —
  content-addressed, schema-stable, partitionable;
- palette-PNG channel semantics: the header parser reports 1 channel
  (index samples, header truth) where PIL reports the post-expansion
  3 — deployments that install PIL and want expanded-channel counts
  should reorder the decode ladder (header parse runs first here);
- cheap metadata (size, container format via magic numbers) is computed
  JVM-side with built-in functions — no Python in that path;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` / ``pandas_udf`` stages (the slow path, but batched
  and columnar), sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Decode is a LADDER: real codec-free header parsing first
(:func:`parse_image_header` — PNG IHDR with chunk validation, GIF
screen descriptor, JPEG SOF segment walk; :func:`parse_wav_header` —
RIFF chunk walk), then a PIL hook if installed, then a
**deterministic stub** (stable pseudo-dimensions/features from an md5
of the payload) for unrecognized payloads. Dimensions and audio
parameters are therefore REAL for the common containers with zero
codec dependencies; pixel/spectral kernels (resize payloads, MFCCs)
still need PIL/ffmpeg/librosa — absent in this container — and stay
stubbed behind the same batch shape. The Spark-side plumbing —
schemas, UDF signatures, batch iteration, partition behavior — is
real and tested throughout.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# magic-number sniffing — JVM-side only (hex prefix compare)
# ---------------------------------------------------------------------------

# (format, hex prefix) — longest prefix first
_MAGIC = [
    ("png", "89504E47"),
    ("gif", "47494638"),
    ("jpeg", "FFD8FF"),
    ("riff", "52494646"),  # wav/avi/webp container
    ("mp4", "66747970"),  # 'ftyp' at offset 4
    ("pdf", "25504446"),
    ("tiff", "49492A00"),  # II little-endian
    ("tiff", "4D4D002A"),  # MM big-endian
    ("flac", "664C6143"),  # 'fLaC'
    ("mp3", "494433"),  # ID3v2-tagged MPEG audio
    # bare MPEG-1/2 Layer III frame syncs (0xFFE? family, common forms)
    ("mp3", "FFFB"),
    ("mp3", "FFFA"),
    ("mp3", "FFF3"),
    ("mp3", "FFF2"),
    ("bmp", "424D"),  # 'BM'
    ("ppm", "5036"),  # 'P6' binary RGB
    ("pgm", "5035"),  # 'P5' binary gray
]


def _spread(df: DataFrame) -> DataFrame:
    """Parallelize the Python decode stages when the input arrives in
    fewer partitions than cores (see operators.dedup._spread): one
    Arrow batch stream per partition means one Python worker per
    partition — a single-split corpus would decode on one core."""
    from pydala2_spark.operators.dedup import _spread as _s

    return _s(df)


def sniff_format(col: str | Column) -> Column:
    """Container format from magic bytes — pure built-in expressions
    (hex prefix compare), zero Python in the scan.

    The 2-byte magics (BMP's ``BM``, netpbm's ``P6``/``P5``) would
    false-positive on ordinary TEXT payloads at corpus scale, so they
    carry a structural conjunct: netpbm requires whitespace after the
    type token, BMP a plausible DIB-header-size byte at offset 14."""
    c = F.col(col) if isinstance(col, str) else col
    ws = ("09", "0A", "0D", "20")
    extra = {
        # BITMAPCOREHEADER(12) / INFO(40) / V2(52) / V3(56) / V4(108) / V5(124)
        "bmp": F.hex(F.substring(c, 15, 1)).isin("0C", "28", "34", "38", "6C", "7C"),
        "ppm": F.hex(F.substring(c, 3, 1)).isin(*ws),
        "pgm": F.hex(F.substring(c, 3, 1)).isin(*ws),
    }
    expr = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        offset = 5 if name == "mp4" else 1  # ftyp sits after the 4-byte box size
        probe = F.hex(F.substring(c, offset, len(magic) // 2))
        cond = probe.startswith(magic)
        if name in extra:
            cond = cond & extra[name]
        expr = F.when(cond, name).otherwise(expr)
    # RIFF is a container family: the form type at offset 8 names the
    # actual format (WAVE/WEBP/'AVI '); unknown forms stay 'riff'
    form = F.substring(c, 9, 4).cast("string")
    expr = F.when(
        expr == "riff",
        F.when(form == "WAVE", "wav")
        .when(form == "WEBP", "webp")
        .when(form == "AVI ", "avi")
        .otherwise("riff"),
    ).otherwise(expr)
    return expr


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("size_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def with_media_metadata(df: DataFrame, binary_col: str, out_col: str = "media_meta") -> DataFrame:
    """Attach the typed metadata struct for a binary media column.
    All three fields are built-in functions → whole-stage codegen."""
    c = F.col(binary_col)
    return df.withColumn(
        out_col,
        F.struct(
            F.octet_length(c).alias("size_bytes"),
            sniff_format(c).alias("format"),
            F.md5(c).alias("content_md5"),
        ),
    )


# ---------------------------------------------------------------------------
# deterministic stub kernels (swap for PIL/ffmpeg/librosa in production)
# ---------------------------------------------------------------------------


def _h32(payload: bytes, lo: int, hi: int) -> int:
    return int(hashlib.md5(payload).hexdigest()[lo:hi], 16)


def _fake_image_decode(payload: bytes) -> tuple[int, int, int]:
    """Stable pseudo (width, height, channels) from content md5.
    Width/height formula is mirrored in SQL oracles: 16 + hex%1008."""
    return 16 + _h32(payload, 0, 4) % 1008, 16 + _h32(payload, 4, 8) % 1008, 3


def _fake_embedding(payload: bytes, dim: int) -> list[float]:
    h = hashlib.md5(payload).digest()
    out = []
    for i in range(dim):
        b = h[i % 16]
        out.append(round((b / 255.0) * 2 - 1, 6))
        h = hashlib.md5(h).digest() if i % 16 == 15 else h
    return out


def _try_real_image_decode(payload: bytes):
    try:
        import io

        from PIL import Image  # not in this container; hook for production

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands())
    except ImportError:
        return None


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL codec-free dimension extraction from container headers —
    no PIL needed: PNG IHDR, GIF logical screen descriptor, and a JPEG
    segment walk to the SOF frame header all carry (width, height,
    channels) in plain bytes. This is the exact metadata the decode
    stage reports, so for these formats the pipeline is fully real in
    this container; pixel access still needs a codec (PIL hook above).
    Returns None for unrecognized payloads (fake-kernel fallback).
    """
    if (
        payload[:8] == b"\x89PNG\r\n\x1a\n"
        and len(payload) >= 26
        and payload[12:16] == b"IHDR"  # validate, don't trust the magic alone
    ):
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        # zero or int32-overflowing dims are hostile-header territory:
        # the downstream Arrow columns are int32 and a resize scale of
        # max(0, 0) divides by zero — same rejection rule as
        # parse_wav_header (fall back to the stub, never crash a batch)
        if not (0 < w < 2**31 and 0 < h < 2**31):
            return None
        # color type -> sample channels (palette indexes expand to 3
        # at decode time; header truth is 1 channel of indexes)
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(payload[25], 3)
        return w, h, channels
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        if not (w and h):
            return None
        return w, h, 3
    webp = parse_webp_header(payload)
    if webp is not None:
        return webp
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from pydala2_spark.operators.tiff import parse_tiff_header

        return parse_tiff_header(payload)
    bmp = _parse_bmp_header(payload)
    if bmp is not None:
        w, h, bpp, _, _ = bmp
        return w, h, {8: 1, 24: 3, 32: 4}.get(bpp, max(1, bpp // 8))
    pnm = _parse_pnm_header(payload)
    if pnm is not None:
        w, h, channels, _, _ = pnm
        return w, h, channels
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt segment stream
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1  # fill byte (spec allows any number before a marker)
                continue
            if marker in (0xD9, 0xDA):
                # EOI / SOS before any SOF: entropy-coded scan data
                # follows SOS and its stuffed 0xFF bytes are NOT
                # segment markers — walking on would misread them and
                # a spurious 0xC0-0xCF pair would yield garbage
                # dimensions. No SOF can validly follow SOS, so fall
                # back to the stub instead.
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                if not (w and h):  # h=0 is legal pre-DNL; stub instead
                    return None
                return w, h, payload[i + 9]
            i += 2 + seglen
    return None


def parse_wav_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL WAV (RIFF/WAVE) parameter extraction — pure chunk walk, no
    audio lib: ``(sample_rate, n_channels, duration_ms)`` from the
    fmt and data chunks. None for non-WAV payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, rate, ch, bits, data_len = 12, None, None, None, None
    fmt, block_align = None, 0
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        # same clen >= 16 guard as decode_wav_samples: short fmt chunks
        # must not read parameters out of the following chunk's header
        if cid == b"fmt " and clen >= 16 and i + 24 <= len(payload):
            fmt = int.from_bytes(payload[i + 8 : i + 10], "little")
            ch = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            block_align = int.from_bytes(payload[i + 20 : i + 22], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            # clamp to the bytes actually present: truncated uploads
            # (common in web-crawled audio) declare lengths the payload
            # doesn't hold, and a duration derived from the DECLARED
            # length would be fabricated
            data_len = min(clen, max(0, len(payload) - (i + 8)))
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    # hostile/corrupt headers must fall back to the stub, not crash the
    # Arrow batch downstream: the output schema is int32 (sample_rate,
    # n_channels), so reject values that don't fit sane WAV reality
    if not rate or not ch or not bits or data_len is None:
        return None
    if not (0 < rate < 2**31) or not (0 < ch <= 2**15):
        return None
    if fmt == 0x11 and bits == 4:  # IMA ADPCM: block-structured
        if block_align < 8 * ch:
            return None
        spb = (block_align - 4 * ch) * 2 // ch + 1
        n_samples = (data_len // block_align) * spb
        return rate, ch, n_samples * 1000 // rate
    if bits not in (8, 16, 24, 32, 64):
        return None
    n_samples = data_len // max(1, ch * bits // 8)
    return rate, ch, n_samples * 1000 // rate


def parse_flac_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL FLAC parameters from the mandatory STREAMINFO metadata
    block (the public FLAC format spec / RFC 9639): ``(sample_rate,
    n_channels, duration_ms)``. STREAMINFO is required to be the first
    metadata block; its tail packs rate(20) | channels-1(3) |
    bits-1(5) | total_samples(36) big-endian. A zero total-samples
    field is legal ('unknown') and reports duration 0 rather than a
    fabricated value."""
    if payload[:4] != b"fLaC" or len(payload) < 8:
        return None
    # first metadata block header: last-flag(1) | type(7), 24-bit length
    btype = payload[4] & 0x7F
    blen = int.from_bytes(payload[5:8], "big")
    if btype != 0 or blen < 34 or len(payload) < 8 + 18:
        return None
    packed = int.from_bytes(payload[18:26], "big")  # STREAMINFO bytes 10..17
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total_samples = packed & ((1 << 36) - 1)
    if not 0 < rate < 2**31:
        return None
    return rate, channels, total_samples * 1000 // rate


# MPEG audio frame-header tables (Layer III), from the public
# MPEG-1/MPEG-2 audio specs: kbit/s by (version-group, bitrate index)
# and Hz by (version, sample-rate index).
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL MPEG Layer III parameters from the first frame header:
    ``(sample_rate, n_channels, duration_ms)``. Skips an ID3v2 tag
    (synchsafe size), then reads version/layer/bitrate/rate/mode from
    the 4-byte frame header. Duration is the CBR estimate
    (stream_bytes * 8 / bitrate) — the honest single-header answer;
    VBR streams would need a full frame walk (or the Xing header),
    which stays out of dependency-free scope."""
    i = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for bb in payload[6:10]:
            if bb & 0x80:
                return None  # synchsafe bytes keep the high bit clear
            size = (size << 7) | bb
        i = 10 + size
    # resync: the first 0xFFE? pair within a bounded probe window
    end = min(len(payload) - 3, i + 4096)
    while i <= end:
        if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
            break
        i += 1
    else:
        return None
    if i + 4 > len(payload):
        return None
    b1, b2, b3 = payload[i + 1], payload[i + 2], payload[i + 3]
    version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b1 >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bitrate_idx = b2 >> 4
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    kbps = (_MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2)[bitrate_idx]
    rate = _MP3_RATES[version][rate_idx]
    channels = 1 if (b3 >> 6) == 3 else 2
    duration_ms = (len(payload) - i) * 8 * 1000 // (kbps * 1000)
    return rate, channels, duration_ms


def parse_audio_header(payload: bytes) -> tuple[int, int, int] | None:
    """Container-dispatch audio metadata ladder: WAV (RIFF chunk
    walk) → FLAC (STREAMINFO) → MP3 (frame header). One tuple shape
    — ``(sample_rate, n_channels, duration_ms)`` — so every caller
    upgrades to the wider format surface without schema change."""
    return (
        parse_wav_header(payload)
        or parse_flac_header(payload)
        or parse_mp3_header(payload)
    )


# ---------------------------------------------------------------------------
# REAL pixel / sample codecs — dependency-free uncompressed formats
# ---------------------------------------------------------------------------
# BMP (24/32-bit BI_RGB, bottom-up or top-down) and netpbm P6/P5 carry
# raw pixel arrays; PCM WAV carries raw integer samples. Decoding them
# needs nothing beyond numpy, which makes decode → feature-extract →
# resize REAL end-to-end for these formats in any environment; the
# compressed formats (PNG/JPEG/GIF, MP3/AAC) keep the header-parse +
# stub ladder until a codec library is present.


def _parse_bmp_header(payload: bytes):
    """``(width, height, bpp, data_offset, top_down)`` for a BMP
    payload, or None. Validates the DIB header size byte so text
    starting with 'BM' can't slip through (same rule as sniff_format).
    """
    if payload[:2] != b"BM" or len(payload) < 26:
        return None
    dib = int.from_bytes(payload[14:18], "little")
    offset = int.from_bytes(payload[10:14], "little")
    if dib == 12:  # BITMAPCOREHEADER: u16 dims, no compression field
        if len(payload) < 26:
            return None
        w = int.from_bytes(payload[18:20], "little")
        h = int.from_bytes(payload[20:22], "little")
        bpp = int.from_bytes(payload[24:26], "little")
        return (w, h, bpp, offset, False) if w > 0 and h > 0 else None
    if dib not in (40, 52, 56, 108, 124) or len(payload) < 34:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if w <= 0 or h == 0 or compression != 0:  # BI_RGB only
        return None
    return w, abs(h), bpp, offset, h < 0


def _parse_pnm_header(payload: bytes):
    """``(width, height, channels, maxval, data_offset)`` for binary
    netpbm (P6 RGB / P5 gray), or None. Tolerates comments and any
    whitespace run in the header, per the netpbm spec."""
    if payload[:2] not in (b"P6", b"P5") or len(payload) < 7:
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    i, fields = 2, []
    while len(fields) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in (b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c"):
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(payload):
        return None
    w, h, maxval = fields
    if not (0 < w < 2**31 and 0 < h < 2**31) or not (0 < maxval < 256):
        return None
    # the spec requires EXACTLY ONE whitespace byte after maxval; a
    # non-whitespace byte there means the offset is ambiguous and the
    # pixel rows would read shifted garbage — reject, don't guess
    if payload[i : i + 1] not in (b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c"):
        return None
    return w, h, channels, maxval, i + 1


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass, the
# order scanlines are stored in an interlaced PNG (ISO/IEC 15948 §8.2)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 2, 4),
    (0, 2, 2, 4),
    (1, 0, 1, 2),
    (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, pos: int, h: int, rowbytes: int, bpp: int):
    """Unfilter ``h`` scanlines of ``rowbytes`` bytes each starting at
    ``raw[pos]`` (each prefixed by its 1-byte filter type), with the
    spec's byte-wise predictors at pixel width ``bpp`` bytes. Returns
    ``(uint8 array (h, rowbytes), next_pos)`` or None on an invalid
    filter byte. Sub/Average/Paeth carry intra-row dependencies —
    sequential per byte, the cost the C-codec fast path exists for."""
    import numpy as np

    out = np.zeros((h, rowbytes), np.int32)
    prev = np.zeros(rowbytes, np.int32)
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, rowbytes, pos + 1).astype(np.int32)
        pos += rowbytes + 1
        if f == 0:
            cur = row
        elif f == 1:  # Sub: left neighbor (sequential in x)
            cur = row
            for x in range(bpp, rowbytes):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up: vectorized
            cur = (row + prev) & 0xFF
        elif f == 3:  # Average
            cur = row
            for x in range(rowbytes):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row
            for x in range(rowbytes):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None  # invalid filter type
        out[y] = cur
        prev = cur
    return out.astype(np.uint8), pos


def _png_rows_to_samples(rows, w: int, nch: int, bitd: int, palette: bool):
    """Unfiltered scanline bytes ``(h, rowbytes)`` → ``(h, w, nch)``
    uint8 samples. 16-bit samples reduce to their most-significant
    byte (the standard 16→8 reduction — exact for the common
    8-bit-content-in-16-bit-container case); sub-8-bit grayscale
    scales to full range (``v * 255 / (2^d - 1)``, the spec's sample
    interpretation); sub-8-bit palette keeps raw indexes."""
    import numpy as np

    h = rows.shape[0]
    if bitd == 8:
        return rows[:, : w * nch].reshape(h, w, nch)
    if bitd == 16:
        # big-endian sample pairs; MSB is byte 0 of each pair
        return rows[:, : w * nch * 2].reshape(h, w * nch, 2)[:, :, 0].reshape(h, w, nch)
    # bitd 1/2/4 — always single-channel (gray or palette indexes);
    # samples pack MSB-first within each byte
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(h, -1, bitd)
    weights = (1 << np.arange(bitd - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.int32)[:, :w]
    if not palette:
        samples = samples * 255 // ((1 << bitd) - 1)
    return samples.astype(np.uint8).reshape(h, w, 1)


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode with nothing but stdlib zlib + numpy:
    chunk walk → IDAT inflate → per-scanline unfilter (all five filter
    types: None/Sub/Up/Average/Paeth) → palette expansion. Supports
    every legal IHDR shape: bit depths 1/2/4/8/16 across gray / RGB /
    palette / gray+alpha / RGBA, non-interlaced AND Adam7 interlaced
    (seven per-pass sub-images unfiltered independently, then
    scattered into the full grid). 16-bit samples reduce to their
    most-significant byte; sub-8-bit grayscale scales to [0, 255].
    Palette images expand to RGB — note the HEADER parser reports
    palette images as 1 channel (index samples); decoded pixels are
    the expanded truth.

    Per-row Python cost is real for the sequential filters (Sub/
    Average/Paeth carry intra-row dependencies); decode_image_pixels
    prefers the Pillow C codec when importable behind the identical
    signature — correctness here is pinned by forward-filter
    round-trip tests over every filter type.
    """
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, w, h, bitd, ct, interlace = 8, None, None, None, None, None
    idat, plte = [], None
    while i + 8 <= len(payload):
        clen = int.from_bytes(payload[i : i + 4], "big")
        cid = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if len(data) < clen:
            return None  # truncated chunk
        if cid == b"IHDR":
            if clen < 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitd, ct, interlace = data[8], data[9], data[12]
        elif cid == b"PLTE":
            plte = data
        elif cid == b"IDAT":
            idat.append(data)
        elif cid == b"IEND":
            break
        i += 12 + clen  # length + type + data + crc
    nch_map = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    # legal IHDR combinations (ISO/IEC 15948 table 11.1): sub-8-bit
    # depths only for gray/palette; 16-bit never for palette
    depth_ok = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }
    if (
        not idat
        or not w
        or not h
        or ct not in nch_map
        or bitd not in depth_ok.get(ct, ())
        or interlace not in (0, 1)
    ):
        return None
    if w * h > 64_000_000:  # decompression-bomb guard (≈256 MB RGBA)
        return None
    # Payload-relative amplification guard (same family as jpeg.py's
    # 2000x decoded/encoded cap): deflate expands at most ~1032x, so a
    # complete stream always satisfies w*h <= 1032*len(payload) —
    # anything above is a truncated claim or a zlib bomb, and rejecting
    # it here skips the per-byte Python unfilter work entirely.
    if w * h > 2000 * max(64, len(payload)):
        return None
    nch = nch_map[ct]
    bpp = max(1, nch * bitd // 8)  # filter pixel width in whole bytes

    def rowbytes(width: int) -> int:
        return (width * nch * bitd + 7) // 8

    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:
        passes = [
            (x0, y0, dx, dy, (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        ]
    need = sum(ph * (rowbytes(pw) + 1) for *_, pw, ph in passes if pw and ph)
    try:
        # cap inflation at exactly the scanline bytes we need — a
        # small IDAT declaring huge dims can't allocate past the
        # 64M-pixel guard anyway, and a zlib bomb can't allocate past
        # the image it claims to be
        raw = zlib.decompressobj().decompress(b"".join(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    arr = np.zeros((h, w, nch), np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in passes:
        if not pw or not ph:
            continue  # pass empty for these dims (small images)
        res = _png_unfilter(raw, pos, ph, rowbytes(pw), bpp)
        if res is None:
            return None
        rows, pos = res
        arr[y0::dy, x0::dx] = _png_rows_to_samples(rows, pw, nch, bitd, ct == 3)
    if ct == 3:  # palette indexes -> RGB
        if plte is None or len(plte) < 3:
            return None
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: len(pal) // 3 * 3].reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            return None
        arr = pal[idx]
    return arr


def _lzw_decode(min_code_size: int, data: bytes, expected: int):
    """GIF-variant LZW decode (variable code width 3..12 bits,
    LSB-first packing, CLEAR/EOI codes). Returns exactly ``expected``
    index bytes, or None on a corrupt stream."""
    if not (2 <= min_code_size <= 8):
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code and next_code < 4096:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            return None
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:expected]) if len(out) >= expected else None


def decode_gif_pixels(payload: bytes):
    """REAL GIF pixel decode — pure-Python LZW + palette expansion +
    Adam-style 4-pass deinterlace; first image frame of GIF87a/89a.
    Returns ``(H, W, 3) uint8`` or None (corrupt / truncated /
    palette-less). With PNG, BMP, and netpbm this leaves JPEG as the
    only image format whose pixels still need an external codec."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 14:
        return None

    def le16(i: int) -> int:
        return int.from_bytes(payload[i : i + 2], "little")

    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension block: label + data sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return None
            w, h = le16(pos + 5), le16(pos + 7)
            ip = payload[pos + 9]
            pos += 10
            pal = gct
            if ip & 0x80:
                n = 2 ** ((ip & 7) + 1)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None or w <= 0 or h <= 0 or pos >= len(payload):
                return None
            if w * h > 64_000_000:
                return None  # decompression-bomb guard
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            # GIF LZW expands at most ~2731x (12-bit code cap: a code
            # emits <=4096 pixels per ~1.5 bytes), so dims claiming
            # more than 4096 pixels per compressed byte are provably
            # invalid — reject before the pure-Python LZW loop runs.
            if w * h > 4096 * max(16, len(data)):
                return None
            idx = _lzw_decode(mcs, bytes(data), w * h)
            if idx is None:
                return None
            grid = np.frombuffer(idx, np.uint8).reshape(h, w)
            if ip & 0x40:  # interlaced: rows stored in 4 passes
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            pal_arr = np.frombuffer(pal, np.uint8)
            pal_arr = pal_arr[: len(pal_arr) // 3 * 3].reshape(-1, 3)
            if pal_arr.size == 0 or int(grid.max()) >= pal_arr.shape[0]:
                return None
            return pal_arr[grid]
        else:  # trailer (0x3B) or garbage before any image frame
            return None
    return None


def encode_gif(arr) -> bytes:
    """Encode ``(H, W, 3) uint8`` (≤256 distinct colors) as a
    single-frame GIF89a — the inverse of :func:`decode_gif_pixels`
    (round-trip pinned by test). Emits literal LZW codes at the
    decoder-tracked width (valid, unoptimized stream)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if pal.shape[0] > 256:
        raise ValueError(f"encode_gif wants <=256 distinct colors, got {pal.shape[0]}")
    depth = max(1, (int(pal.shape[0]) - 1).bit_length())
    table_n = 1 << depth
    gct = pal.tobytes() + b"\x00" * (3 * (table_n - pal.shape[0]))
    mcs = max(2, depth)
    sub = _gif_lzw_literal_stream(inverse.astype(int), mcs)
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (depth - 1), 0, 0])
        + gct
        + b"\x2c"
        + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([mcs])
        + sub
        + b"\x00"
        + b"\x3b"
    )


def _gif_lzw_literal_stream(indices, mcs: int) -> bytes:
    """All-literal-code GIF LZW stream (valid, unoptimized) packed
    into data sub-blocks — shared by the still and animation
    encoders."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes = bytearray()
    acc = nbits = 0
    code_size = mcs + 1
    next_code = eoi + 1

    def emit(c: int) -> None:
        nonlocal acc, nbits, code_size
        acc |= c << nbits
        nbits += code_size
        while nbits >= 8:
            codes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    first = True
    for px in indices:
        emit(int(px))
        if first:
            first = False
        elif next_code < 4096:
            next_code += 1  # mirror the decoder's table growth
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    emit(eoi)
    if nbits:
        codes.append(acc & 0xFF)
    return b"".join(
        bytes([min(255, len(codes) - i)]) + bytes(codes[i : i + 255])
        for i in range(0, len(codes), 255)
    )


def encode_gif_animation(
    frames,
    delays_cs=None,
    offsets=None,
    disposals=None,
    transparent_color=None,
    loop: bool = True,
) -> bytes:
    """Encode an animated GIF89a. ``frames[0]`` sets the logical
    canvas; later frames may be smaller patches placed at
    ``offsets[i]`` (default (0, 0)). One GLOBAL palette is built over
    all frames (≤256 distinct colors incl. ``transparent_color``).
    Per-frame GCE carries ``delays_cs[i]`` (centiseconds, default 5)
    and ``disposals[i]`` (1 = keep, 2 = restore background,
    3 = restore previous; default 1). Pixels equal to
    ``transparent_color`` (an RGB triple) encode as the transparent
    index and leave the underlying canvas showing — the inverse of
    :func:`decode_gif_frames` (round-trips pinned by tests)."""
    import numpy as np

    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not arrs:
        raise ValueError("need at least one frame")
    arrs = [np.repeat(a[:, :, None], 3, axis=2) if a.ndim == 2 else a for a in arrs]
    ch, cw, _ = arrs[0].shape
    n = len(arrs)
    delays_cs = list(delays_cs or [5] * n)
    offsets = list(offsets or [(0, 0)] * n)
    disposals = list(disposals or [1] * n)
    if not (len(delays_cs) == len(offsets) == len(disposals) == n):
        raise ValueError("per-frame lists must match frame count")
    if offsets[0] != (0, 0) or arrs[0].shape[:2] != (ch, cw):
        raise ValueError("frame 0 must cover the full canvas at (0, 0)")
    for a, (x0, y0) in zip(arrs, offsets):
        if y0 + a.shape[0] > ch or x0 + a.shape[1] > cw:
            raise ValueError("frame patch exceeds the canvas")

    colors = np.unique(np.concatenate([a.reshape(-1, 3) for a in arrs]), axis=0)
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8).reshape(1, 3)
        if not (colors == tc).all(axis=1).any():
            colors = np.concatenate([colors, tc])
            colors = colors[np.lexsort(colors.T[::-1])]
    if colors.shape[0] > 256:
        raise ValueError(
            f"encode_gif_animation wants <=256 distinct colors, got {colors.shape[0]}"
        )
    lut = {tuple(c): i for i, c in enumerate(colors)}
    t_idx = lut[tuple(np.asarray(transparent_color, dtype=np.uint8))] if (
        transparent_color is not None
    ) else None
    depth = max(1, (int(colors.shape[0]) - 1).bit_length())
    table_n = 1 << depth
    gct = colors.astype(np.uint8).tobytes() + b"\x00" * (3 * (table_n - colors.shape[0]))
    mcs = max(2, depth)

    out = bytearray()
    out += b"GIF89a"
    out += cw.to_bytes(2, "little") + ch.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0]) + gct
    if loop:  # NETSCAPE2.0 infinite-loop application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for a, d_cs, (x0, y0), disp in zip(arrs, delays_cs, offsets, disposals):
        flags = (int(disp) & 7) << 2
        tbyte = 0
        if t_idx is not None:
            flags |= 1
            tbyte = t_idx
        out += b"\x21\xf9\x04" + bytes([flags])
        out += int(d_cs).to_bytes(2, "little") + bytes([tbyte, 0])
        fh, fw, _ = a.shape
        idx = np.array(
            [lut[tuple(px)] for px in a.reshape(-1, 3)], dtype=np.int64
        )
        out += b"\x2c"
        out += x0.to_bytes(2, "little") + y0.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out += b"\x00" + bytes([mcs])
        out += _gif_lzw_literal_stream(idx, mcs)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """REAL animated-GIF decode: every frame COMPOSED onto the logical
    canvas — GCE delay/transparency/disposal (1 keep, 2 restore
    background, 3 restore previous), local palettes, interlace, patch
    placement. Returns ``(frames, delays_ms)`` where ``frames[i]`` is
    the composed ``(H, W, 3) uint8`` canvas after frame ``i`` and
    ``delays_ms[i]`` its GCE delay (centiseconds × 10; 0 when absent),
    or None (corrupt / truncated / palette-less / bomb). The canvas
    starts at the logical-screen background color (transparent-first
    viewers differ; deterministic here, pinned by tests).

    Same bomb guards as :func:`decode_gif_pixels`: ≤64M canvas
    pixels, per-frame LZW expansion ratio, ≤1024 frames."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 14:
        return None

    def le16(i: int) -> int:
        return int.from_bytes(payload[i : i + 2], "little")

    cw, ch = le16(6), le16(8)
    if cw <= 0 or ch <= 0 or cw * ch > 64_000_000:
        return None
    packed = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    if gct is not None and 3 * bg + 3 <= len(gct):
        bg_rgb = gct[3 * bg : 3 * bg + 3]
    else:
        bg_rgb = b"\x00\x00\x00"
    canvas = np.empty((ch, cw, 3), np.uint8)
    canvas[:] = np.frombuffer(bg_rgb, np.uint8)

    frames: list = []
    delays_ms: list[int] = []
    delay_cs = 0
    disposal = 0
    t_idx = -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                return None
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and pos < len(payload) and payload[pos] >= 4:
                flags = payload[pos + 1]
                delay_cs = le16(pos + 2)
                disposal = (flags >> 2) & 7
                t_idx = payload[pos + 4] if flags & 1 else -1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload) or len(frames) >= 1024:
                return None
            x0, y0 = le16(pos + 1), le16(pos + 3)
            w, h = le16(pos + 5), le16(pos + 7)
            ip = payload[pos + 9]
            pos += 10
            pal = gct
            if ip & 0x80:
                n = 2 ** ((ip & 7) + 1)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if (
                pal is None
                or w <= 0
                or h <= 0
                or x0 + w > cw
                or y0 + h > ch
                or pos >= len(payload)
            ):
                return None
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if w * h > 4096 * max(16, len(data)):
                return None  # LZW expansion bound (see decode_gif_pixels)
            idx = _lzw_decode(mcs, bytes(data), w * h)
            if idx is None:
                return None
            grid = np.frombuffer(idx, np.uint8).reshape(h, w)
            if ip & 0x40:  # interlaced patch
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            pal_arr = np.frombuffer(pal, np.uint8)
            pal_arr = pal_arr[: len(pal_arr) // 3 * 3].reshape(-1, 3)
            if pal_arr.size == 0 or int(grid.max()) >= pal_arr.shape[0]:
                return None
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[y0 : y0 + h, x0 : x0 + w]
            if 0 <= t_idx:
                opaque = grid != t_idx
                region[opaque] = pal_arr[grid[opaque]]
            else:
                region[:] = pal_arr[grid]
            frames.append(canvas.copy())
            delays_ms.append(delay_cs * 10)
            if disposal == 2:  # restore background in the frame rect
                canvas[y0 : y0 + h, x0 : x0 + w] = np.frombuffer(bg_rgb, np.uint8)
            elif disposal == 3 and prev is not None:
                canvas = prev
            delay_cs, disposal, t_idx = 0, 0, -1
        elif b == 0x3B:  # trailer
            break
        else:
            return None
    if not frames:
        return None
    return frames, delays_ms


def encode_png(arr) -> bytes:
    """Encode ``(H, W, C) uint8`` (C in 1/2/3/4) as a non-interlaced
    8-bit PNG with filter-0 scanlines — the inverse of
    :func:`decode_png_pixels` (round-trip pinned by test)."""
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ct, 0, 0, 0])
    )
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(scan)

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + (zlib.crc32(cid + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


_PIL_CACHE: list = []  # memoized [Image_module_or_None]


def _load_pil():
    """Resolve ``PIL.Image`` once per process — None when Pillow is
    absent (this container). Split out as a module-level hook so tests
    can monkeypatch a fake codec and pin the ladder's preference
    order without the real dependency."""
    if not _PIL_CACHE:
        try:
            from PIL import Image  # type: ignore

            _PIL_CACHE.append(Image)
        except Exception:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0]


def _codec_decode_lossless(payload: bytes):
    """C-codec fast path: decode via Pillow when importable. Only ever
    invoked for payloads where the codec output is BIT-IDENTICAL to
    the pure-Python kernels (lossless containers have exactly one
    correct pixel grid), so swapping it in cannot move any oracle —
    but it replaces the per-byte Python unfilter/LZW loops with
    libpng/giflib, the ~100x production win the scale notes call for.
    Returns None when Pillow is absent or refuses the payload; the
    caller falls back to the deterministic pure-Python kernel."""
    Image = _load_pil()
    if Image is None:
        return None
    import io

    import numpy as np

    try:
        with Image.open(io.BytesIO(payload)) as im:
            # header-only at this point; apply the same bomb guard the
            # pure kernels enforce BEFORE pixel allocation
            if im.width * im.height > 64_000_000:
                return None
            if im.mode == "P":
                # match the pure-Python decoders' palette expansion
                im = im.convert("RGB")
            arr = np.asarray(im)
    except Exception:
        return None
    if arr.dtype != np.uint8:
        return None  # 16-bit etc: pure kernel owns the semantics
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.size == 0:
        return None
    return np.ascontiguousarray(arr)


def encode_png_ext(samples, bitd: int, ct: int, interlace: int, plte=None) -> bytes:
    """Generalized PNG encoder (filter-0 scanlines): any legal bit
    depth 1/2/4/8/16, any color type, non-interlaced or Adam7 — the
    spec-side inverse of the extended :func:`decode_png_pixels` paths
    (16-bit big-endian samples, MSB-first sub-byte packing, per-pass
    interlace scanlines). ``samples`` is ``(H, W, nch)`` holding RAW
    sample values: palette indexes for ct=3, 16-bit values for
    bitd=16. Used by oracle queries to synthesize every decoder shape
    deterministically."""
    import zlib

    import numpy as np

    a = np.asarray(samples)
    h, w, nch = a.shape

    def pack_rows(sub) -> bytes:
        ph = sub.shape[0]
        rows = []
        for y in range(ph):
            if bitd == 16:
                row = sub[y].astype(">u2").tobytes()
            elif bitd == 8:
                row = sub[y].astype(np.uint8).tobytes()
            else:  # 1/2/4-bit single-channel, MSB-first within bytes
                vals = sub[y, :, 0].astype(np.uint8)
                bits = np.unpackbits(vals[:, None], axis=1)[:, 8 - bitd :]
                flat = bits.flatten()
                pad = (-len(flat)) % 8
                flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
                row = np.packbits(flat).tobytes()
            rows.append(b"\x00" + row)
        return b"".join(rows)

    if interlace == 0:
        scan = pack_rows(a)
    else:
        scan = b"".join(
            pack_rows(a[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if a[y0::dy, x0::dx].size
        )

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + (zlib.crc32(cid + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([bitd, ct, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", np.asarray(plte, dtype=np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")


def decode_image_pixels(payload: bytes, prefer_codec: str = "auto"):
    """REAL pixel decode: ``(H, W, C) uint8`` numpy array for every
    common image container, all dependency-free — BMP 24/32-bit BI_RGB
    (bottom-up and top-down, row padding honored, BGR→RGB), binary
    netpbm P6/P5, PNG at every legal bit depth incl. 16-bit and Adam7
    (stdlib zlib inflate + scanline unfilter,
    :func:`decode_png_pixels`), GIF (pure-Python
    LZW + palette + deinterlace, :func:`decode_gif_pixels`), and
    baseline + progressive JPEG (Huffman entropy decode + dequant +
    IDCT + YCbCr, `operators/jpeg.decode_jpeg_pixels`), and
    WebP-lossless / VP8L (prefix codes + LZ77 + color cache + all four
    transforms, `operators/vp8l.decode_webp_pixels`), and baseline
    TIFF (strips, none/PackBits compression,
    `operators/tiff.decode_tiff_pixels`) — or None (arithmetic JPEG /
    lossy VP8 / tiled-LZW TIFF / unrecognized: the deterministic stub
    ladder).

    ``prefer_codec`` picks the PNG/GIF execution engine:

    - ``"auto"`` (default): Pillow when importable for 8-bit PNG and
      GIF — bit-identical output, C-speed — falling back to the
      pure-Python kernels. JPEG always uses the in-repo decoder
      (libjpeg's IDCT rounding differs at the last bit, and the
      oracle queries pin OUR rounding).
    - ``"pure"``: force the dependency-free kernels (determinism
      audits, codec-diff testing).
    - ``"codec"``: prefer Pillow for everything including JPEG —
      opt-in, because lossy output is codec-specific."""
    import numpy as np

    bmp = _parse_bmp_header(payload)
    if bmp is not None:
        w, h, bpp, offset, top_down = bmp
        if bpp not in (24, 32):
            return None
        nch = bpp // 8
        stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
        need = offset + stride * h
        if len(payload) < need:
            return None
        rows = np.frombuffer(payload, np.uint8, stride * h, offset)
        arr = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            arr = arr[::-1]  # stored bottom-up
        # BGR(A) storage order → RGB(A)
        arr = arr[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
        return np.ascontiguousarray(arr)
    pnm = _parse_pnm_header(payload)
    if pnm is not None:
        w, h, nch, _, offset = pnm
        need = offset + w * h * nch
        if len(payload) < need:
            return None
        return (
            np.frombuffer(payload, np.uint8, w * h * nch, offset)
            .reshape(h, w, nch)
            .copy()
        )
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # codec path only for 8-bit depth (payload[24] is IHDR bitd —
        # IHDR is mandated first): 8-bit decode is bit-identical in
        # every conformant codec; 16-bit→8-bit reduction semantics are
        # ours, so the pure kernel owns them
        if prefer_codec != "pure" and len(payload) > 24 and payload[24] == 8:
            arr = _codec_decode_lossless(payload)
            if arr is not None:
                return arr
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if prefer_codec != "pure":
            arr = _codec_decode_lossless(payload)
            if arr is not None:
                return arr
        return decode_gif_pixels(payload)
    if payload[:3] == b"\xff\xd8\xff":
        if prefer_codec == "codec":  # opt-in only: lossy, codec-specific rounding
            arr = _codec_decode_lossless(payload)
            if arr is not None:
                return arr
        from pydala2_spark.operators.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from pydala2_spark.operators.tiff import decode_tiff_pixels

        if prefer_codec != "pure":
            arr = _codec_decode_lossless(payload)
            if arr is not None:
                return arr
        return decode_tiff_pixels(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from pydala2_spark.operators.vp8l import (
            _find_vp8l_chunk,
            decode_webp_pixels,
        )

        if _find_vp8l_chunk(payload) is not None:  # lossless: one true grid
            if prefer_codec != "pure":
                arr = _codec_decode_lossless(payload)
                if arr is not None:
                    return arr
            return decode_webp_pixels(payload)
        return None  # lossy VP8 frame data: out of dependency-free scope
    return None


def encode_bmp(arr) -> bytes:
    """Encode an ``(H, W, 3) uint8`` array as a 24-bit bottom-up BMP —
    the inverse of :func:`decode_image_pixels` (round-trip pinned by
    test); used by the real resize kernel to emit decodable payloads."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (H, W, 3) uint8, got {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB→BGR, bottom-up
    pix = rows.tobytes()
    header = (
        b"BM"
        + (54 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + pix


def parse_mp4_header(payload: bytes):
    """REAL MP4/ISO-BMFF metadata from the box structure — no codec:
    ``(duration_ms, width, height)`` from ``moov/mvhd`` (timescale +
    duration) and the first video ``trak/tkhd`` (16.16 fixed-point
    dimensions). Width/height are None for audio-only files; returns
    None when no valid ``moov`` is present (streaming-optimized files
    with moov after a huge mdat still parse — the walk skips boxes by
    declared size)."""

    def walk(lo: int, hi: int):
        while lo + 8 <= hi:
            size = int.from_bytes(payload[lo : lo + 4], "big")
            typ = payload[lo + 4 : lo + 8]
            if size == 1:  # 64-bit largesize
                if lo + 16 > hi:
                    return
                size = int.from_bytes(payload[lo + 8 : lo + 16], "big")
                body = lo + 16
            elif size == 0:  # to end of file
                size = hi - lo
                body = lo + 8
            else:
                body = lo + 8
            if size < 8 or lo + size > hi:
                return
            yield typ, body, lo + size
            lo += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    dur_ms = None
    width = height = None
    for typ, body, end in walk(0, len(payload)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in walk(body, end):
            if t2 == b"mvhd" and b2 < e2:
                ver = payload[b2]
                if ver == 1 and b2 + 32 <= e2:
                    ts = int.from_bytes(payload[b2 + 20 : b2 + 24], "big")
                    dur = int.from_bytes(payload[b2 + 24 : b2 + 32], "big")
                elif ver == 0 and b2 + 20 <= e2:
                    ts = int.from_bytes(payload[b2 + 12 : b2 + 16], "big")
                    dur = int.from_bytes(payload[b2 + 16 : b2 + 20], "big")
                else:
                    continue
                if ts:
                    dur_ms = dur * 1000 // ts
            elif t2 == b"trak":
                for t3, b3, e3 in walk(b2, e2):
                    if t3 == b"tkhd" and width is None:
                        ver = payload[b3]
                        off = b3 + (96 if ver == 1 else 84)
                        if off <= e3:  # width/height are the LAST 8 bytes before off
                            w = int.from_bytes(payload[off - 8 : off - 4], "big") >> 16
                            h = int.from_bytes(payload[off - 4 : off], "big") >> 16
                            if w and h:
                                width, height = w, h
        break
    if dur_ms is None:
        return None
    return dur_ms, width, height


def parse_webp_header(payload: bytes):
    """REAL WebP dimensions from the VP8 / VP8L / VP8X chunk headers
    (lossy frame tag, lossless 14-bit packed, extended canvas), or
    None."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP" or len(payload) < 30:
        return None
    chunk = payload[12:16]
    if chunk == b"VP8 ":  # lossy: frame tag then sync code 9D 01 2A
        if payload[23:26] != b"\x9d\x01\x2a":
            return None
        w = int.from_bytes(payload[26:28], "little") & 0x3FFF
        h = int.from_bytes(payload[28:30], "little") & 0x3FFF
        return (w, h, 3) if w and h else None
    if chunk == b"VP8L":  # lossless: 1-byte signature 0x2F, 14+14 bits
        if payload[20] != 0x2F:
            return None
        bits = int.from_bytes(payload[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h, 4 if (bits >> 28) & 1 else 3
    if chunk == b"VP8X":  # extended: 24-bit canvas minus one
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h, 4 if payload[20] & 0x10 else 3
    return None


def encode_wav_pcm16(samples, rate: int) -> bytes:
    """Encode int16 samples (``(n,)`` or ``(n, channels)``) as a
    16-bit PCM WAV — the inverse of :func:`decode_wav_samples`
    (round-trip pinned by test); the synthesis side of the real audio
    pipeline's fixtures."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = rate * ch * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# IMA ADPCM step-size table (89 entries) and index-adjust table —
# IMA "Recommended Practices for Enhancing Digital Audio Compatibility"
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_adpcm_block(blk: bytes, ch: int, spb: int):
    """Decode one IMA ADPCM block: per-channel 4-byte headers
    (int16 predictor, uint8 step index), then channel-interleaved
    4-byte nibble groups (low nibble first). Returns (spb, ch) int32
    or None on a malformed header."""
    import numpy as np

    out = np.zeros((spb, ch), np.int32)
    preds, idxs = [], []
    for c in range(ch):
        p = int.from_bytes(blk[4 * c : 4 * c + 2], "little", signed=True)
        ix = blk[4 * c + 2]
        if ix > 88:
            return None
        preds.append(p)
        idxs.append(ix)
        out[0, c] = p
    # data: groups of 4 bytes (8 nibbles = 8 samples) rotating channels
    pos = 4 * ch
    counts = [1] * ch
    while pos + 4 <= len(blk):
        group = (pos - 4 * ch) // 4
        c = group % ch
        pred, ix = preds[c], idxs[c]
        k = counts[c]
        for byte in blk[pos : pos + 4]:
            for nib in (byte & 15, byte >> 4):
                step = _IMA_STEPS[ix]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                ix = max(0, min(88, ix + _IMA_INDEX[nib & 7]))
                if k < spb:
                    out[k, c] = pred
                    k += 1
        preds[c], idxs[c], counts[c] = pred, ix, k
        pos += 4
    return out


def decode_wav_samples(payload: bytes):
    """REAL sample decode: ``(sample_rate, (n, channels) int32
    array)`` for WAV audio — integer PCM (format 1; 8/16/24/32-bit,
    8-bit re-centered from unsigned), IEEE float (format 3; 32/64-bit,
    values scaled to the int16 grid via ``rint(v * 32767)``),
    A-law (format 6; G.711 alaw2linear, full-scale ±32256),
    µ-law (format 7; Sun ulaw2linear expansion at the 16-bit scale,
    full-scale ±32124), and IMA ADPCM (format 0x11; per-block
    predictor + step-index state machine, mono/stereo interleave) — or
    None for compressed/unknown formats. Pure RIFF chunk walk +
    numpy, no audio library."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt, rate, ch, bits = 12, None, None, None, None
    block_align = 0
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        # clen >= 16 is required before trusting the fmt fields: a
        # malformed fmt chunk declaring a shorter length would read
        # rate/channels/bits from the NEXT chunk's header bytes —
        # garbage-but-plausible parameters instead of the honest None
        if cid == b"fmt " and clen >= 16 and i + 24 <= len(payload):
            fmt = int.from_bytes(payload[i + 8 : i + 10], "little")
            ch = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            block_align = int.from_bytes(payload[i + 20 : i + 22], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            avail = max(0, len(payload) - (i + 8))
            data = payload[i + 8 : i + 8 + min(clen, avail)]
        i += 8 + clen + (clen & 1)
    ok = (
        (fmt == 1 and bits in (8, 16, 24, 32))
        or (fmt == 3 and bits in (32, 64))
        or (fmt in (6, 7) and bits == 8)
        or (fmt == 0x11 and bits == 4)
    )
    if not ok or not rate or not ch or data is None:
        return None
    if not (0 < rate < 2**31) or not (0 < ch <= 2**15):
        return None
    if fmt == 0x11:  # IMA ADPCM: block-structured, not frame-structured
        if ch > 2 or block_align < 8 * ch or (block_align - 4 * ch) % (4 * ch):
            return None
        spb = (block_align - 4 * ch) * 2 // ch + 1
        nblocks = len(data) // block_align
        if nblocks == 0:
            return None
        parts = []
        for b in range(nblocks):
            blk = _ima_adpcm_block(
                data[b * block_align : (b + 1) * block_align], ch, spb
            )
            if blk is None:
                return None
            parts.append(blk)
        return rate, np.concatenate(parts, axis=0)
    frame = ch * bits // 8
    n = len(data) // max(1, frame)
    data = data[: n * frame]
    if fmt == 3:  # IEEE float: scale [-1, 1] onto the int16 grid
        f = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float64)
        f = np.nan_to_num(f, nan=0.0, posinf=1.0, neginf=-1.0)
        s = np.rint(np.clip(f, -1.0, 1.0) * 32767).astype(np.int32)
    elif fmt == 6:  # A-law: G.711 alaw2linear (Sun reference)
        a = np.frombuffer(data, np.uint8).astype(np.int32) ^ 0x55
        mant = a & 15
        seg = (a >> 4) & 7
        t = np.where(
            seg == 0,
            (mant << 4) + 8,
            ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
        )
        s = np.where(a & 0x80, t, -t).astype(np.int32)
    elif fmt == 7:  # µ-law: G.711 expansion
        u = (~np.frombuffer(data, np.uint8)).astype(np.int32) & 0xFF
        sign = u >> 7
        exp = (u >> 4) & 7
        mant = u & 15
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        s = np.where(sign == 1, -mag, mag).astype(np.int32)
    elif bits == 8:
        s = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    elif bits == 16:
        s = np.frombuffer(data, "<i2").astype(np.int32)
    elif bits == 32:
        s = np.frombuffer(data, "<i4").astype(np.int32)
    else:  # 24-bit: pad each 3-byte frame to 4 and sign-extend
        raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
        ext = np.zeros((raw.shape[0], 4), np.uint8)
        ext[:, :3] = raw
        s = np.where(
            raw[:, 2] >= 128,
            ext.view("<u4")[:, 0].astype(np.int64) - (1 << 24),
            ext.view("<u4")[:, 0].astype(np.int64),
        ).astype(np.int32)
    return rate, s.reshape(n, ch)


# ---------------------------------------------------------------------------
# decode / feature-extract / resize / frame-sample — mapInPandas stages
# ---------------------------------------------------------------------------

IMAGE_DECODE_FIELDS = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
]


def decode_images(df: DataFrame, binary_col: str, passthrough: list[str]) -> DataFrame:
    """Decode dimensions for an image column.

    Runs as ``mapInPandas`` (Arrow batches in/out); each batch decodes
    row-wise inside the worker — at scale the cost is pure CPU on the
    executors, no shuffle, and the binary column never crosses the
    driver. Pass only the columns you need through (column pruning
    happens at the scan because the schema is explicit).
    """
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + IMAGE_DECODE_FIELDS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # real decode ladder: header parse (always available, no
            # codec) → PIL if installed → deterministic fake for
            # unrecognized payloads (the test corpus's text blobs)
            dims = [
                parse_image_header(bytes(b))
                or _try_real_image_decode(b)
                or _fake_image_decode(bytes(b))
                for b in pdf[binary_col]
            ]
            out = pdf[passthrough].copy()
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["channels"] = [d[2] for d in dims]
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


def _grid_features(arr, dim: int) -> list[float]:
    """REAL deterministic image features: gray means over a g×g grid
    (g = ceil(sqrt(dim))), scaled to [-1, 1] — the classic tiny-
    thumbnail descriptor. Not a learned embedding, but honestly
    computed from the pixels; production swaps in a model call with
    the same signature."""
    import math

    import numpy as np

    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    g = max(1, math.ceil(math.sqrt(dim)))
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    out = []
    for i in range(g):
        for j in range(g):
            cell = gray[ys[i] : max(ys[i] + 1, ys[i + 1]), xs[j] : max(xs[j] + 1, xs[j + 1])]
            out.append(round(float(cell.mean()) / 127.5 - 1.0, 6))
            if len(out) == dim:
                return out
    return out


def extract_features(
    df: DataFrame,
    binary_col: str,
    passthrough: list[str],
    dim: int = 64,
    prefer_codec: str = "auto",
) -> DataFrame:
    """Embedding extraction stage: binary → ``array<float>`` feature
    vector. Decodable payloads (BMP/PPM/PGM/PNG/GIF/baseline JPEG —
    :func:`decode_image_pixels`) get REAL grid features from their
    pixels (note the PNG/JPEG per-row Python cost rides here); other
    payloads keep the deterministic stub (production swaps in a model
    call per Arrow batch). Output feeds operators.similarity /
    operators.dedup directly."""
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[passthrough].copy()
            feats = []
            for b in pdf[binary_col]:
                p = bytes(b)
                arr = decode_image_pixels(p, prefer_codec=prefer_codec)
                feats.append(
                    _grid_features(arr, dim) if arr is not None else _fake_embedding(p, dim)
                )
            out["features"] = feats
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


IMAGE_PIXEL_STATS_FIELDS = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
    T.StructField("px_topleft", T.IntegerType()),
]


def image_pixel_stats(
    df: DataFrame,
    binary_col: str,
    passthrough: list[str],
    prefer_codec: str = "auto",
) -> DataFrame:
    """REAL pixel statistics per image — width/height/channels plus
    ``px_sum`` (over every channel byte), min/max, and the top-left
    first-channel value (which pins row order and stride handling: a
    decoder that mis-walks BMP bottom-up storage or row padding gets
    these wrong). Non-decodable payloads keep their header/stub
    dimensions with null pixel stats — the honest answer, never a
    fabricated one. Arrow-batched ``mapInPandas``; numpy reductions
    per image, no per-pixel Python."""
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + IMAGE_PIXEL_STATS_FIELDS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {f.name: [] for f in IMAGE_PIXEL_STATS_FIELDS}
            for b in pdf[binary_col]:
                p = bytes(b)
                arr = decode_image_pixels(p, prefer_codec=prefer_codec)
                if arr is not None:
                    h, w, c = arr.shape
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["channels"].append(c)
                    cols["n_pixels"].append(int(h) * int(w))
                    cols["px_sum"].append(int(arr.sum(dtype="int64")))
                    cols["px_min"].append(int(arr.min()))
                    cols["px_max"].append(int(arr.max()))
                    cols["px_topleft"].append(int(arr[0, 0, 0]))
                else:
                    dims = parse_image_header(p) or _fake_image_decode(p)
                    cols["width"].append(dims[0])
                    cols["height"].append(dims[1])
                    cols["channels"].append(dims[2])
                    for k in ("n_pixels", "px_sum", "px_min", "px_max", "px_topleft"):
                        cols[k].append(None)
            out = pdf[passthrough].copy()
            for f in IMAGE_PIXEL_STATS_FIELDS:
                out[f.name] = pd.array(
                    cols[f.name],
                    dtype="Int64" if isinstance(f.dataType, T.LongType) else "Int32",
                )
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


GIF_FRAME_STATS_FIELDS = [
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
    T.StructField("px_topleft", T.IntegerType()),
]


def gif_frame_stats(
    df: DataFrame,
    binary_col: str,
    passthrough: list[str],
    n_frames: int | None = None,
) -> DataFrame:
    """REAL video-style frame sampling over animated GIFs — unlike
    :func:`sample_frames` (whose per-frame content is a stub for
    opaque containers), every row here comes from an actually DECODED,
    disposal-composed canvas: ``ts_ms`` is the frame's true position
    on the GCE-delay timeline and the pixel stats are reductions over
    the composed frame. ``n_frames=None`` emits every frame;
    otherwise frames sample evenly across the animation
    (``idx = j * total // n``, matching :func:`sample_frames`'s
    timestamp law). Non-decodable payloads emit no rows — the honest
    answer for a FRAME query (the metadata path reports them).

    The row explosion happens inside ``mapInPandas``: a long
    animation never materializes more than one decoded canvas set per
    task, and only fixed-width stats rows cross out of the stage."""
    import numpy as np

    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + GIF_FRAME_STATS_FIELDS
    )
    names = [f.name for f in GIF_FRAME_STATS_FIELDS]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in list(pdf.columns) + names}
            for _, in_row in pdf.iterrows():
                dec = decode_gif_frames(bytes(in_row[binary_col]))
                if dec is None:
                    continue
                frames, delays = dec
                total = len(frames)
                starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
                picks = (
                    range(total)
                    if n_frames is None or n_frames >= total
                    else [j * total // n_frames for j in range(n_frames)]
                )
                for i in picks:
                    arr = frames[i]
                    for c in passthrough:
                        rows[c].append(in_row[c])
                    rows["frame_index"].append(i)
                    rows["ts_ms"].append(int(starts[i]))
                    rows["width"].append(arr.shape[1])
                    rows["height"].append(arr.shape[0])
                    rows["px_sum"].append(int(arr.sum(dtype="int64")))
                    rows["px_min"].append(int(arr.min()))
                    rows["px_max"].append(int(arr.max()))
                    rows["px_topleft"].append(int(arr[0, 0, 0]))
            out = pd.DataFrame({c: rows[c] for c in passthrough + names})
            for f in GIF_FRAME_STATS_FIELDS:
                out[f.name] = out[f.name].astype(
                    "int64" if isinstance(f.dataType, T.LongType) else "int32"
                )
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


AUDIO_PCM_STATS_FIELDS = [
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("abs_sum", T.LongType()),
    T.StructField("s_min", T.IntegerType()),
    T.StructField("s_max", T.IntegerType()),
    T.StructField("zero_crossings", T.LongType()),
]


def audio_pcm_stats(df: DataFrame, binary_col: str, passthrough: list[str]) -> DataFrame:
    """REAL PCM statistics per clip: sample counts, absolute-amplitude
    sum, min/max, and channel-0 zero crossings (strict sign change:
    ``s[i-1]*s[i] < 0``) — all from :func:`decode_wav_samples`'s
    integer samples, so the numbers are exact and oracle-mirrorable.
    Non-PCM payloads yield null stats (rate/channels from the header
    walk when recognizable, stub otherwise)."""
    import numpy as np

    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + AUDIO_PCM_STATS_FIELDS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {f.name: [] for f in AUDIO_PCM_STATS_FIELDS}
            for b in pdf[binary_col]:
                p = bytes(b)
                dec = decode_wav_samples(p)
                if dec is not None:
                    rate, s = dec
                    c0 = s[:, 0].astype(np.int64)
                    cols["sample_rate"].append(rate)
                    cols["n_channels"].append(int(s.shape[1]))
                    cols["n_samples"].append(int(s.shape[0]))
                    cols["abs_sum"].append(int(np.abs(s, dtype=np.int64).sum()))
                    cols["s_min"].append(int(s.min()) if s.size else None)
                    cols["s_max"].append(int(s.max()) if s.size else None)
                    cols["zero_crossings"].append(int((c0[:-1] * c0[1:] < 0).sum()))
                else:
                    w = parse_audio_header(p)
                    cols["sample_rate"].append(
                        w[0] if w else [8000, 16000, 22050, 44100][_h32(p, 12, 14) % 4]
                    )
                    cols["n_channels"].append(w[1] if w else 1 + _h32(p, 14, 15) % 2)
                    for k in ("n_samples", "abs_sum", "s_min", "s_max", "zero_crossings"):
                        cols[k].append(None)
            out = pdf[passthrough].copy()
            for f in AUDIO_PCM_STATS_FIELDS:
                out[f.name] = pd.array(
                    cols[f.name],
                    dtype="Int64" if isinstance(f.dataType, T.LongType) else "Int32",
                )
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


AUDIO_FEATURE_FIELDS = [
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("mfcc", T.ArrayType(T.FloatType())),
]


def _hz_to_mel(f):
    """HTK mel scale: ``m = 2595 log10(1 + f/700)``."""
    import numpy as np

    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    import numpy as np

    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _mel_filterbank(n_filters: int, n_fft: int, rate: int):
    """Triangular mel filterbank ``(n_filters, n_fft//2 + 1)`` — HTK
    convention: ``n_filters + 2`` points equally spaced in MEL between
    0 Hz and Nyquist, each filter a triangle rising from point i to
    its center i+1 and falling to i+2. Numpy only; center frequencies
    are pinned by test against the closed-form mel formula."""
    import numpy as np

    pts = _mel_to_hz(np.linspace(0.0, float(_hz_to_mel(rate / 2.0)), n_filters + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_filters, n_fft // 2 + 1))
    for i in range(n_filters):
        lo, ce, hi = bins[i], bins[i + 1], bins[i + 2]
        for j in range(lo, ce):
            fb[i, j] = (j - lo) / max(1, ce - lo)
        for j in range(ce, min(hi, n_fft // 2)):
            fb[i, j] = (hi - j) / max(1, hi - ce)
    return fb


def _mel_spectrogram(samples, rate: int, n_filters: int, n_fft: int = 512):
    """Channel-mean PCM → ``(n_frames, n_filters)`` mel-band power:
    half-overlapping Hann frames → rFFT power → triangular mel
    filterbank. The shared front half of :func:`_mfcc_features`,
    exposed so tests can pin tone recovery in the mel domain."""
    import numpy as np

    mono = samples.astype(np.float64).mean(axis=1)
    if mono.size < n_fft:
        mono = np.pad(mono, (0, n_fft - mono.size))
    hop = n_fft // 2
    n_frames = 1 + (mono.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / n_fft
    return power @ _mel_filterbank(n_filters, n_fft, rate).T


def _mfcc_features(
    samples, rate: int, n_mfcc: int, n_filters: int = 26, n_fft: int = 512
) -> list[float]:
    """TRUE mel-cepstral features from PCM samples, numpy alone:
    Hann-windowed framing → rFFT power spectrum → triangular mel
    filterbank (:func:`_mel_filterbank`) → log → orthonormal DCT-II →
    first ``n_mfcc`` coefficients, averaged over frames (one clip-level
    vector — the usual pooling for retrieval/dedup features)."""
    import numpy as np

    if samples.size == 0 or rate <= 0:
        return [0.0] * n_mfcc
    n_filters = max(n_filters, n_mfcc)
    logmel = np.log(_mel_spectrogram(samples, rate, n_filters, n_fft) + 1e-10)
    n = n_filters
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(np.pi * k * (2.0 * np.arange(n)[None, :] + 1.0) / (2.0 * n))
    dct *= np.sqrt(2.0 / n)
    dct[0] *= np.sqrt(0.5)  # orthonormal DCT-II scaling
    mfcc = logmel @ dct.T
    return [round(float(x), 6) for x in mfcc.mean(axis=0)]


def extract_audio_features(
    df: DataFrame, binary_col: str, passthrough: list[str], n_mfcc: int = 13
) -> DataFrame:
    """Audio decode + feature stage: (sample_rate, duration, channels,
    MFCC-like vector). Real WAV payloads get REAL parameters via the
    codec-free metadata ladder (:func:`parse_audio_header` — WAV chunk
    walk, FLAC STREAMINFO, MP3 frame header), and
    integer-PCM payloads additionally get a REAL mel-cepstral vector
    from their decoded samples (:func:`decode_wav_samples` →
    :func:`_mfcc_features`); compressed formats and unrecognized
    payloads fall back to the deterministic md5 stub (librosa/ffmpeg
    absent in this container), schema and batch shape identical."""
    out_schema = T.StructType([df.schema[c] for c in passthrough] + AUDIO_FEATURE_FIELDS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[passthrough].copy()
            payloads = [bytes(b) for b in pdf[binary_col]]
            parsed = [parse_audio_header(p) for p in payloads]
            out["sample_rate"] = [
                w[0] if w else [8000, 16000, 22050, 44100][_h32(p, 12, 14) % 4]
                for w, p in zip(parsed, payloads)
            ]
            out["duration_ms"] = [
                w[2] if w else 1000 + _h32(p, 8, 12) % 59_000
                for w, p in zip(parsed, payloads)
            ]
            out["n_channels"] = [
                w[1] if w else 1 + _h32(p, 14, 15) % 2
                for w, p in zip(parsed, payloads)
            ]
            mfcc = []
            for p in payloads:
                dec = decode_wav_samples(p)
                mfcc.append(
                    _mfcc_features(dec[1], dec[0], n_mfcc)
                    if dec is not None
                    else _fake_embedding(p, n_mfcc)
                )
            out["mfcc"] = mfcc
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    binary_col: str,
    passthrough: list[str],
    max_side: int = 256,
    emit_payload: bool = False,
    prefer_codec: str = "auto",
) -> DataFrame:
    """Resize stage. Default: emits the clamped target dimensions
    computed from the decoded size (pure projection over the decode
    stage — no pixel work, oracle-mirrorable for every format).

    ``emit_payload=True`` adds a ``resized_payload`` column holding a
    REAL re-encoded image: decodable payloads (BMP/PPM/PGM/PNG/GIF/
    baseline JPEG) are nearest-neighbor resampled on their actual
    pixels and re-encoded as 24-bit BMP (:func:`encode_bmp` — itself
    decodable, so resize chains); non-decodable payloads carry a null
    payload with their header/stub dimensions. One decode per image,
    inside the same Arrow batch stage."""
    if not emit_payload:
        decoded = decode_images(df, binary_col, passthrough)
        scale = F.least(
            F.lit(1.0),
            F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
        )
        return decoded.select(
            *passthrough,
            "width",
            "height",
            F.ceil(F.col("width") * scale).cast("int").alias("resized_width"),
            F.ceil(F.col("height") * scale).cast("int").alias("resized_height"),
        )

    import math

    import numpy as np

    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized_width", T.IntegerType()),
            T.StructField("resized_height", T.IntegerType()),
            T.StructField("resized_payload", T.BinaryType()),
        ]
    )

    def target(w: int, h: int) -> tuple[int, int]:
        # max(..., 1): parse_image_header rejects zero dims, but this
        # stage must never divide by zero whatever upstream hands it
        scale = min(1.0, max_side / max(w, h, 1))
        return math.ceil(w * scale), math.ceil(h * scale)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, rws, rhs, payloads = [], [], [], [], []
            for b in pdf[binary_col]:
                p = bytes(b)
                arr = decode_image_pixels(p, prefer_codec=prefer_codec)
                if arr is not None:
                    h, w = arr.shape[:2]
                    rw, rh = target(w, h)
                    # nearest-neighbor sample grid (the cheap exact
                    # kernel; swap for area/bilinear in production)
                    yi = np.minimum((np.arange(rh) * h) // rh, h - 1)
                    xi = np.minimum((np.arange(rw) * w) // rw, w - 1)
                    small = arr[yi][:, xi, :3]
                    if small.shape[2] == 1:
                        small = np.repeat(small, 3, axis=2)
                    elif small.shape[2] == 2:  # gray+alpha: replicate luma
                        small = np.repeat(small[:, :, :1], 3, axis=2)
                    payloads.append(encode_bmp(small))
                else:
                    dims = parse_image_header(p) or _fake_image_decode(p)
                    w, h = dims[0], dims[1]
                    rw, rh = target(w, h)
                    payloads.append(None)
                ws.append(w)
                hs.append(h)
                rws.append(rw)
                rhs.append(rh)
            out = pdf[passthrough].copy()
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            out["resized_width"] = pd.array(rws, dtype="Int32")
            out["resized_height"] = pd.array(rhs, dtype="Int32")
            out["resized_payload"] = payloads
            yield out

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    passthrough: list[str],
    n_frames: int = 4,
) -> DataFrame:
    """Video frame sampling: one input row → ``n_frames`` output rows
    (frame_index, ts_ms, frame md5 stub). The row explosion happens
    inside ``mapInPandas`` so a 1 GB video never materializes more than
    once per task; at scale, repartition upstream so large videos
    spread across executors."""
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    cols = passthrough + ["frame_index", "ts_ms", "frame_md5"]
    suffixes = [str(i).encode() for i in range(n_frames)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            payloads = [bytes(p) for p in pdf[binary_col]]
            # vectorized explosion: frame_index tiles, everything
            # row-level repeats — no per-row pandas iteration.
            # Durations are REAL for parseable MP4 containers (moov/
            # mvhd box walk), deterministic stub otherwise.
            def dur_of(p: bytes) -> int:
                mp4 = parse_mp4_header(p) if p[4:8] == b"ftyp" else None
                if mp4 and mp4[0] > 0:
                    return mp4[0]
                return 1000 + _h32(p, 8, 12) % 59_000

            idx = np.tile(np.arange(n_frames, dtype=np.int64), n)
            durs = np.fromiter(
                (dur_of(p) for p in payloads), dtype=np.int64, count=n
            )
            ts = np.repeat(durs, n_frames) * idx // n_frames
            # each payload hashes ONCE; per-frame digests fork from the
            # shared md5 state (identical to md5(payload + str(i)))
            md5s: list[str] = []
            for p in payloads:
                base = hashlib.md5(p)
                for s in suffixes:
                    h = base.copy()
                    h.update(s)
                    md5s.append(h.hexdigest())
            out = {c: pdf[c].to_numpy().repeat(n_frames) for c in passthrough}
            out["frame_index"] = idx.astype(np.int32)
            out["ts_ms"] = ts
            out["frame_md5"] = md5s
            yield pd.DataFrame(out)

    return _spread(df).select(*passthrough, binary_col).mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# media near-duplicate detection (byte-slice blockhash)
# ---------------------------------------------------------------------------

BLOCKHASH_BITS = 48  # positive int64, matches the SimHash chunking


def blockhash48(col: str) -> Column:
    """48-bit blockhash of a string/binary payload, pure JVM-side.

    Blockhash-style locality: the payload is cut into 48 equal slices
    and bit j is the parity of md5(slice j) — payloads differing in a
    few local regions differ in few bits, so Hamming distance tracks
    how much of the byte stream changed. This is the codec-free stand-
    in for a perceptual image hash: with a real decoder, swap the byte
    slices for luminance blocks and the pipeline (hash → pigeonhole
    chunk join → Hamming verify) is unchanged.

    One projection, 48 md5 calls per row, zero Python, zero shuffle —
    at 100 TB the hash rides in the scan stage like any other derived
    column.
    """
    terms = []
    for j in range(BLOCKHASH_BITS):
        slice_expr = (
            f"substring({col}, 1 + cast(({j} * length({col})) div {BLOCKHASH_BITS} as int), "
            f"greatest(cast(length({col}) div {BLOCKHASH_BITS} as int), 1))"
        )
        bit = f"cast(conv(substr(md5({slice_expr}), 1, 1), 16, 10) as int) % 2"
        terms.append(f"IF({bit} = 1, {1 << j}L, 0L)")
    return F.expr(" + ".join(terms))


def media_near_duplicates(
    df: DataFrame,
    binary_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate media pairs by blockhash Hamming distance —
    retried uploads with re-encoded headers, trimmed trailers, or
    small edits collapse to the same cluster while the byte-exact
    md5 dedup would miss them.

    Reference analogue: none (no media handling). Reuses the exact-
    recall pigeonhole chunk join shared with text SimHash
    (:func:`operators.dedup.hamming_near_pairs`); the per-item hash
    frame is materialized once across the self-join sides.
    """
    from pydala2_spark.operators.dedup import _materialize_once, hamming_near_pairs

    hashed = _materialize_once(
        _spread(df).select(F.col(id_col), blockhash48(binary_col).alias("bh"))
    )
    return hamming_near_pairs(
        hashed, "bh", id_col, BLOCKHASH_BITS, max_hamming, chunks
    )


def parse_exif(payload: bytes) -> tuple[int, int, int | None] | None:
    """EXIF metadata from a JPEG APP1 segment — pure byte walk over
    the public structures (JPEG segment stream -> APP1 "Exif\\0\\0" ->
    embedded TIFF IFD, reusing the TIFF reader): returns
    ``(orientation, resolution_unit, iso)`` with ``iso`` read from
    the EXIF sub-IFD (tag 0x8769 -> 0x8827) when present, else None.
    Returns None when the payload is not a JPEG or carries no
    EXIF APP1. Orientation is the 1-8 rotation/mirror code cameras
    stamp; values 5-8 mean the DISPLAY dimensions are the SOF
    dimensions swapped — the correction every thumbnail/resize stage
    must apply before geometry math."""
    from pydala2_spark.operators.tiff import _read_ifd

    if payload[:3] != b"\xff\xd8\xff":
        return None
    i = 2
    while i + 4 < len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD9, 0xDA):
            return None  # scan data reached without an APP1
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            tiff = payload[i + 10 : i + 2 + seglen]
            r = _read_ifd(tiff)
            if r is None:
                return None
            tags, _bo = r
            orientation = tags.get(0x0112, [1])[0]
            if not 1 <= orientation <= 8:
                orientation = 1
            res_unit = tags.get(0x0128, [2])[0]
            iso = None
            sub = tags.get(0x8769)
            if sub:
                rs = _read_ifd(tiff, ifd_offset=sub[0])
                if rs is not None:
                    iso = rs[0].get(0x8827, [None])[0]
            return orientation, res_unit, iso
        i += 2 + seglen
    return None
