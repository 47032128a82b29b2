"""Pure-stdlib media codecs: PNG (zlib/struct) and WAV PCM (struct).

Real decoders — no image/audio library required — covering the formats a
training-data pipeline most often has to fingerprint at scale: PNG
(8-bit grayscale / RGB / RGBA, non-interlaced) and RIFF WAVE (PCM 8/16-bit).
Anything else raises ``ValueError`` loudly: a corpus pipeline must never
silently emit fake features for bytes it cannot actually read.

The decoders run inside Arrow ``mapInPandas`` batches
(operators/multimodal.extract_media_features): per-blob Python cost is the
honest price of a codec in this environment — the *distribution* (schema,
batch iterator, partition sizing) is the part that must scale, and does.
A production deployment swaps these functions for a vectorized library
behind the same dict contract without touching the Spark plumbing.

Encoders exist for fixtures and round-trip tests: deterministic media bytes
generated from table rows let an SQL oracle verify the decode path
end-to-end (the analytic pixel/sample sums in plans/queries.py).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 0, filter_type: int = 0
) -> bytes:
    """Minimal PNG encoder (fixture/test side). ``pixels`` is the raw
    raster (row-major, ``width*height*channels`` bytes); every scanline is
    written with the same ``filter_type`` (0..4) so round-trip tests can
    exercise each unfilter branch."""
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{ch}"
        )

    def flt(line: bytes, prev: bytes) -> bytes:
        if filter_type == 0:
            return line
        out = bytearray(len(line))
        for i, x in enumerate(line):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filter_type == 1:
                out[i] = (x - a) & 255
            elif filter_type == 2:
                out[i] = (x - b) & 255
            elif filter_type == 3:
                out[i] = (x - ((a + b) >> 1)) & 255
            else:  # 4 Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (x - pr) & 255
        return bytes(out)

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += flt(line, prev)
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, ch: int) -> bytes:
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG: decompressed size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 255
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 255
        elif ft != 0:
            raise ValueError(f"PNG: unknown scanline filter {ft}")
        out += line
        prev = line
    return bytes(out)


def png_raster(data: bytes) -> tuple[int, int, int, bytes]:
    """The parse half of :func:`decode_png`, exposed for patch/tile
    featurization (ViT-style patching needs the raster, not just its
    summary stats): returns ``(width, height, channels, unfiltered
    raster bytes)``. Same envelope — 8-bit depth, color types 0/2/6,
    no interlace; anything outside it raises."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("PNG: bad signature")
    pos = len(_PNG_SIG)
    width = height = None
    ch = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"PNG: unsupported bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"PNG: unsupported color type {ctype}")
            if inter != 0:
                raise ValueError("PNG: interlaced images unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("PNG: nonstandard compression/filter method")
            ch = _PNG_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None or ch is None:
        raise ValueError("PNG: missing IHDR")
    px = _png_unfilter(zlib.decompress(bytes(idat)), width, height, ch)
    return width, height, ch, px


def decode_png(data: bytes) -> dict:
    """Decode a PNG: returns format/width/height/channels plus pixel stats
    (count, sum, min, max over all samples). Supports 8-bit depth, color
    types 0/2/6, no interlace — the honest envelope; anything outside it
    raises."""
    width, height, ch, px = png_raster(data)
    return {
        "format": "png",
        "width": width,
        "height": height,
        "channels": ch,
        "sample_rate": None,
        "duration_ms": None,
        "value_count": len(px),
        "value_sum": sum(px),
        "value_min": min(px) if px else None,
        "value_max": max(px) if px else None,
    }


# --------------------------------------------------------------------------
# WAV (RIFF PCM)
# --------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: list[int], bits: int = 16) -> bytes:
    """Minimal mono PCM WAV encoder (fixture/test side)."""
    if bits == 16:
        payload = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        payload = bytes((s + 128) & 255 for s in samples)
    else:
        raise ValueError(f"unsupported bits {bits}")
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_pcm(data: bytes) -> tuple[int, int, tuple]:
    """The parse half of :func:`decode_wav`, exposed for frame-level
    featurization (windowed energy / VAD needs the samples, not just
    their summary stats): returns ``(sample_rate, channels, samples)``
    with samples interleaved. Same envelope — RIFF PCM 8/16-bit."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("WAV: truncated chunk")
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1:
                raise ValueError(f"WAV: non-PCM format {audio_fmt}")
            if bits not in (8, 16):
                raise ValueError(f"WAV: unsupported bit width {bits}")
        elif tag == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or payload is None:
        raise ValueError("WAV: missing fmt/data chunk")
    if bits == 16:
        n = len(payload) // 2
        vals = struct.unpack(f"<{n}h", payload[: 2 * n])
    else:
        vals = tuple(b - 128 for b in payload)
    return rate, channels, vals


def decode_wav(data: bytes) -> dict:
    """Decode a RIFF WAVE file: PCM 8/16-bit, any channel count. Returns
    format/channels/sample_rate/duration plus sample stats (count, sum,
    min, max over all channels' samples)."""
    rate, channels, vals = wav_pcm(data)
    n_frames = len(vals) // channels
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": rate,
        "duration_ms": n_frames * 1000 // rate if rate else None,
        "value_count": len(vals),
        "value_sum": sum(vals),
        "value_min": min(vals) if vals else None,
        "value_max": max(vals) if vals else None,
    }


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24-bpp uncompressed)
# --------------------------------------------------------------------------

def encode_bmp24(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Minimal bottom-up 24-bpp BMP encoder (fixture/test side).
    ``pixels_bgr`` is the top-down raster, 3 bytes/pixel."""
    if len(pixels_bgr) != width * height * 3:
        raise ValueError("BMP: raster size mismatch")
    rowlen = width * 3
    pad = (4 - rowlen % 4) % 4
    raster = b"".join(
        pixels_bgr[y * rowlen : (y + 1) * rowlen] + b"\x00" * pad
        for y in range(height - 1, -1, -1)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    return hdr + dib + raster


def decode_bmp(data: bytes) -> dict:
    """Decode a 24-bpp uncompressed bottom-up BMP: dims + exact stats over
    every raster byte (B,G,R samples). Compressed/paletted/top-down
    variants raise — the honest envelope."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("BMP: bad signature")
    (off,) = struct.unpack_from("<I", data, 10)
    size, width, height, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if size < 40:
        raise ValueError("BMP: pre-BITMAPINFOHEADER DIB unsupported")
    if bpp != 24 or comp != 0:
        raise ValueError(f"BMP: unsupported bpp={bpp}/compression={comp}")
    if height <= 0 or width <= 0:
        raise ValueError("BMP: top-down or degenerate dims unsupported")
    rowlen = width * 3
    stride = rowlen + (4 - rowlen % 4) % 4
    if off + stride * height > len(data):
        raise ValueError("BMP: truncated raster")
    px = bytearray()
    for y in range(height - 1, -1, -1):
        start = off + y * stride
        px += data[start : start + rowlen]
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "sample_rate": None,
        "duration_ms": None,
        "value_count": len(px),
        "value_sum": sum(px),
        "value_min": min(px) if px else None,
        "value_max": max(px) if px else None,
    }


# --------------------------------------------------------------------------
# GIF (logical-screen header only — metadata extraction, no LZW raster)
# --------------------------------------------------------------------------

def encode_gif_header(width: int, height: int) -> bytes:
    """Minimal GIF89a shell (fixture side): logical screen descriptor, no
    global color table, immediate trailer. Enough for metadata sniffing;
    carries no raster by design."""
    return (
        b"GIF89a" + struct.pack("<HH", width, height) + bytes([0, 0, 0]) + b"\x3b"
    )


def decode_gif_header(data: bytes) -> dict:
    """GIF logical-screen metadata (width/height). HEADER-ONLY by design:
    pixel stats are reported empty (count 0), never fabricated — LZW
    raster decode is outside this codec set's envelope."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    width, height = struct.unpack_from("<HH", data, 6)
    return {
        "format": "gif",
        "width": width,
        "height": height,
        "channels": None,
        "sample_rate": None,
        "duration_ms": None,
        "value_count": 0,
        "value_sum": 0,
        "value_min": None,
        "value_max": None,
    }


def sniff_format(data: bytes) -> str | None:
    """Cheap magic-byte dispatch; None for unrecognized bytes."""
    if data.startswith(_PNG_SIG):
        return "png"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 13 and data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if len(data) >= 54 and data[:2] == b"BM":
        return "bmp"
    return None


def decode_media(data: bytes) -> dict:
    """Dispatch on magic bytes; raise for formats this engine cannot
    actually decode — fake features must never ship silently."""
    kind = sniff_format(data or b"")
    if kind == "png":
        return decode_png(data)
    if kind == "wav":
        return decode_wav(data)
    if kind == "gif":
        return decode_gif_header(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise ValueError(
        "unrecognized media bytes (supported: PNG, RIFF WAVE, GIF, BMP); "
        "use extract_features(codec='fake') only for plumbing tests"
    )
