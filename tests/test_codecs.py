"""Pure-stdlib media codec tests (operators/codecs.py) plus the strict /
fake decode contract of the multimodal operators."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from etl_jetro_spark.operators.codecs import (
    decode_media,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    sniff_format,
)


def _raster(w, h, ch=1, seed=7):
    return bytes((seed + 31 * i) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    """Each PNG scanline filter (None/Sub/Up/Average/Paeth) must unfilter
    back to the identical raster."""
    w, h = 9, 5
    px = _raster(w, h)
    meta = decode_png(encode_png(w, h, px, color_type=0, filter_type=filter_type))
    assert (meta["width"], meta["height"], meta["channels"]) == (w, h, 1)
    assert meta["value_count"] == w * h
    assert meta["value_sum"] == sum(px)
    assert meta["value_min"] == min(px) and meta["value_max"] == max(px)


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_color_types(color_type, ch):
    w, h = 6, 4
    px = _raster(w, h, ch)
    meta = decode_png(encode_png(w, h, px, color_type=color_type, filter_type=4))
    assert meta["channels"] == ch
    assert meta["value_count"] == w * h * ch
    assert meta["value_sum"] == sum(px)


def test_png_rejects_corruption_and_unsupported():
    good = encode_png(4, 3, _raster(4, 3))
    # flip one IDAT byte -> CRC failure
    bad = bytearray(good)
    idat = good.index(b"IDAT")
    bad[idat + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth unsupported -> loud error, never fake output
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_wav_roundtrip_16_and_8_bit():
    samples = [((i * 104729) % 65536) - 32768 for i in range(120)]
    meta = decode_wav(encode_wav(8000, samples))
    assert meta["sample_rate"] == 8000
    assert meta["channels"] == 1
    assert meta["duration_ms"] == 120 * 1000 // 8000
    assert meta["value_count"] == 120
    assert meta["value_sum"] == sum(samples)
    small = [(i % 256) - 128 for i in range(50)]
    meta8 = decode_wav(encode_wav(16000, small, bits=8))
    assert meta8["value_sum"] == sum(small)
    assert meta8["value_count"] == 50


def test_wav_rejects_non_pcm_and_truncation():
    good = encode_wav(8000, [0, 1, 2, 3])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(good[4:])
    # audio format 3 (IEEE float) -> unsupported
    bad = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 3)
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(bad))


def test_sniff_and_dispatch():
    png = encode_png(2, 2, _raster(2, 2))
    wav = encode_wav(8000, [1, -1])
    assert sniff_format(png) == "png" and sniff_format(wav) == "wav"
    assert sniff_format(b"plain text") is None
    assert decode_media(png)["format"] == "png"
    assert decode_media(wav)["format"] == "wav"
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media(b"plain text")


def test_extract_features_strict_rejects_text_bytes(spark):
    """The old silent-fake behavior is gone: strict (default) decode over
    non-media bytes must fail the job, fake requires explicit opt-in."""
    from etl_jetro_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, bytearray(b"not media"))], ["media_id", "content"]
    )
    with pytest.raises(Exception, match="unrecognized"):
        extract_features(df).collect()
    fake = extract_features(df, codec="fake").collect()
    assert len(fake) == 1 and 64 <= fake[0]["thumb_w"] < 256


def test_extract_media_features_mixed_formats(spark):
    """One frame carrying PNG and WAV blobs decodes both, with per-format
    nulls in the right places."""
    from etl_jetro_spark.operators.multimodal import extract_media_features

    png = encode_png(5, 4, _raster(5, 4))
    wav = encode_wav(8000, list(range(-40, 40)))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], ["media_id", "content"]
    )
    rows = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert rows[1]["format"] == "png"
    assert (rows[1]["width"], rows[1]["height"]) == (5, 4)
    assert rows[1]["sample_rate"] is None
    assert rows[2]["format"] == "wav"
    assert rows[2]["sample_rate"] == 8000 and rows[2]["width"] is None
    assert rows[2]["value_sum"] == sum(range(-40, 40))


# --- GIF / BMP (round-3 second wave) --------------------------------------


def test_bmp_roundtrip_with_row_padding():
    from etl_jetro_spark.operators.codecs import decode_bmp, encode_bmp24

    # width 3 -> 9-byte rows padded to 12; bottom-up reorder must undo
    w, h = 3, 4
    px = bytes((i * 11) % 256 for i in range(w * h * 3))
    meta = decode_bmp(encode_bmp24(w, h, px))
    assert (meta["width"], meta["height"], meta["channels"]) == (w, h, 3)
    assert meta["value_count"] == w * h * 3
    assert meta["value_sum"] == sum(px)
    assert meta["value_min"] == min(px) and meta["value_max"] == max(px)


def test_bmp_rejects_unsupported_variants():
    import struct

    import pytest

    from etl_jetro_spark.operators.codecs import decode_bmp, encode_bmp24

    good = bytearray(encode_bmp24(2, 2, bytes(12)))
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(good[2:]))  # bad signature
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)  # 8-bpp paletted
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))
    topdown = bytearray(good)
    struct.pack_into("<i", topdown, 22, -2)  # negative height
    with pytest.raises(ValueError):
        decode_bmp(bytes(topdown))
    with pytest.raises(ValueError):
        decode_bmp(bytes(good[:-4]))  # truncated raster


def test_gif_header_roundtrip_and_honest_empty_stats():
    import pytest

    from etl_jetro_spark.operators.codecs import (
        decode_gif_header,
        encode_gif_header,
    )

    meta = decode_gif_header(encode_gif_header(320, 200))
    assert (meta["width"], meta["height"]) == (320, 200)
    # header-only: stats must be EMPTY, never fabricated
    assert meta["value_count"] == 0 and meta["value_min"] is None
    with pytest.raises(ValueError):
        decode_gif_header(b"GIF99a" + bytes(7))


def test_decode_media_dispatches_all_four_formats():
    from etl_jetro_spark.operators.codecs import (
        decode_media,
        encode_bmp24,
        encode_gif_header,
        encode_png,
        encode_wav,
    )

    assert decode_media(encode_png(2, 2, bytes(4)))["format"] == "png"
    assert decode_media(encode_wav(8000, [0, 1, -1]))["format"] == "wav"
    assert decode_media(encode_bmp24(2, 2, bytes(12)))["format"] == "bmp"
    assert decode_media(encode_gif_header(9, 9))["format"] == "gif"


def test_png_raster_exposes_exact_pixels():
    from etl_jetro_spark.operators.codecs import encode_png, png_raster

    px = bytes((i * 7) % 256 for i in range(5 * 3))
    w, h, ch, out = png_raster(encode_png(5, 3, px))
    assert (w, h, ch) == (5, 3, 1) and out == px


def test_wav_pcm_exposes_exact_samples():
    from etl_jetro_spark.operators.codecs import encode_wav, wav_pcm

    samples = [0, 100, -100, 32767, -32768]
    rate, channels, vals = wav_pcm(encode_wav(8000, samples))
    assert (rate, channels) == (8000, 1) and list(vals) == samples


def test_image_patch_stats_exact_tiling(spark):
    """2x2 tiling of a 4x4 gradient: each quadrant's stats are hand-
    computable; color rasters must raise (honest envelope)."""
    from etl_jetro_spark.operators.codecs import encode_png
    from etl_jetro_spark.operators.multimodal import image_patch_stats

    px = bytes(range(16))  # 4x4: row y holds 4y..4y+3
    df = spark.createDataFrame(
        [(1, encode_png(4, 4, px))], ["media_id", "content"]
    )
    rows = {r["patch_id"]: r for r in image_patch_stats(df).collect()}
    # patch 0 = {0,1,4,5}, 1 = {2,3,6,7}, 2 = {8,9,12,13}, 3 = {10,11,14,15}
    assert rows[0]["px_sum"] == 10 and rows[0]["px_min"] == 0
    assert rows[1]["px_sum"] == 18 and rows[1]["px_max"] == 7
    assert rows[2]["px_sum"] == 42 and rows[3]["px_sum"] == 50
    assert all(r["px_count"] == 4 for r in rows.values())

    import pytest as _pt

    from etl_jetro_spark.operators.codecs import encode_png as _ep

    rgb = spark.createDataFrame(
        [(2, _ep(2, 2, bytes(12), color_type=2))], ["media_id", "content"]
    )
    with _pt.raises(Exception):
        image_patch_stats(rgb).collect()


def test_wav_energy_windows_exact_framing(spark):
    """10 ms @ 8 kHz = 80-sample windows; a 100-sample clip yields one
    full and one 20-sample partial window with exact sum-of-squares."""
    from etl_jetro_spark.operators.codecs import encode_wav
    from etl_jetro_spark.operators.multimodal import wav_energy_windows

    samples = [(-1) ** i * (i % 7) for i in range(100)]
    df = spark.createDataFrame(
        [(7, encode_wav(8000, samples))], ["media_id", "content"]
    )
    rows = {
        r["window_id"]: r
        for r in wav_energy_windows(df, window_ms=10).collect()
    }
    assert rows[0]["n_samples"] == 80 and rows[1]["n_samples"] == 20
    assert rows[0]["sumsq"] == sum(s * s for s in samples[:80])
    assert rows[1]["sumsq"] == sum(s * s for s in samples[80:])
