"""Pure-stdlib PNG codec (operators/png.py): spec conformance,
round-trip under every filter, malformed-input rejection, resize and
frame-container semantics. No Spark session needed — these are the
kernel tests backing the tier-24 exact-oracle queries."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_rep_spark.operators import multimodal, png

# ---------------------------------------------------------------------------
# round-trip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_fixed_filter(ftype, channels):
    w, h = 7, 5
    px = bytes((11 * i + 3) % 256 for i in range(w * h * channels))
    blob = png.encode_png(px, w, h, channels, filter_choice=ftype)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    out, w2, h2, c2 = png.decode_png(blob)
    assert (out, w2, h2, c2) == (px, w, h, channels)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 16), st.integers(1, 12), st.sampled_from([1, 3]),
       st.integers(0, 2 ** 31 - 1))
def test_roundtrip_property(w, h, channels, seed):
    # deterministic pseudo-random pixels + per-row filter cycling
    px = bytes((seed + 137 * i) % 256 for i in range(w * h * channels))
    blob = png.encode_png(px, w, h, channels,
                          filter_choice=lambda y: (seed + y) % 5)
    out, w2, h2, c2 = png.decode_png(blob)
    assert (out, w2, h2, c2) == (px, w, h, channels)


def test_single_pixel_and_flat_images():
    for val in (0, 255):
        blob = png.encode_png(bytes([val]), 1, 1, 1, filter_choice=4)
        assert png.decode_png(blob)[0] == bytes([val])


# ---------------------------------------------------------------------------
# malformed input rejection (a decoder that ignores CRCs or chunk
# structure is not a PNG decoder)
# ---------------------------------------------------------------------------


def _valid_blob():
    return png.encode_png(bytes(range(12)), 4, 3, 1, filter_choice=1)


def test_bad_signature_rejected():
    with pytest.raises(png.PngError, match="signature"):
        png.decode_png(b"NOTAPNG!" + _valid_blob()[8:])


def test_crc_corruption_rejected():
    blob = bytearray(_valid_blob())
    # flip one bit inside the IDAT payload (after the 8-byte sig +
    # 25-byte IHDR chunk + 8-byte IDAT header)
    blob[8 + 25 + 8] ^= 0x01
    with pytest.raises(png.PngError, match="CRC"):
        png.decode_png(bytes(blob))


def test_truncated_rejected():
    blob = _valid_blob()
    with pytest.raises(png.PngError):
        png.decode_png(blob[:len(blob) - 6])


def test_wrong_decompressed_length_rejected():
    # hand-build a PNG whose IDAT inflates to the wrong size
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\xaa")  # 2 bytes; needs (2+1)*2 = 6
    blob = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", idat) + png._chunk(b"IEND", b""))
    with pytest.raises(png.PngError, match="decompressed"):
        png.decode_png(blob)


def test_truncated_mid_crc_rejected():
    """A payload cut inside a chunk's 4 CRC bytes must raise PngError,
    not leak a struct.error."""
    blob = _valid_blob()
    # end of IHDR chunk = 8 (sig) + 25 (IHDR); cut 2 bytes into its CRC
    for cut in (8 + 25 - 2, 8 + 25 - 1):
        with pytest.raises(png.PngError, match="truncated"):
            png.decode_png(blob[:cut])


def test_declared_size_ceiling_rejected():
    """A tiny payload declaring absurd IHDR dimensions must be refused
    BEFORE any pixel-buffer allocation (zlib-bomb defense)."""
    ihdr = struct.pack(">IIBBBBB", 2 ** 30, 2 ** 30, 8, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IEND", b""))
    with pytest.raises(png.PngError, match="ceiling"):
        png.decode_png(blob)


def test_overlong_idat_stream_bounded():
    """An IDAT stream inflating past the declared size must fail after
    at most declared+1 bytes of output — never a full inflate."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # compresses to ~10 KB but would inflate to 10 MB; declared = 6 B
    idat = zlib.compress(b"\x00" * (10 * 1024 * 1024))
    blob = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", idat) + png._chunk(b"IEND", b""))
    with pytest.raises(png.PngError, match="decompressed"):
        png.decode_png(blob)


def test_unsupported_depth_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IEND", b""))
    with pytest.raises(png.PngError, match="bit depth"):
        png.decode_png(blob)


def test_ancillary_chunks_skipped():
    blob = _valid_blob()
    # splice a tEXt chunk between IHDR and IDAT (spec: ancillary
    # chunks must be skippable)
    head, rest = blob[:8 + 25], blob[8 + 25:]
    spliced = head + png._chunk(b"tEXt", b"comment\x00hi") + rest
    assert png.decode_png(spliced)[0] == png.decode_png(blob)[0]


def test_multi_idat_reassembly():
    # split the IDAT stream across two chunks; decoders must
    # concatenate all IDAT data before inflating
    px = bytes(range(24))
    blob = png.encode_png(px, 4, 6, 1)
    sig, pos = blob[:8], 8
    chunks = []
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        chunks.append((blob[pos + 4:pos + 8], blob[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    out = sig
    for ctype, data in chunks:
        if ctype == b"IDAT":
            mid = len(data) // 2
            out += png._chunk(b"IDAT", data[:mid])
            out += png._chunk(b"IDAT", data[mid:])
        else:
            out += png._chunk(ctype, data)
    assert png.decode_png(out)[0] == px


# ---------------------------------------------------------------------------
# resize + frames
# ---------------------------------------------------------------------------


def test_resize_nearest_indexing():
    px = bytes(range(12))  # 4x3 grayscale
    out = png.resize_nearest(px, 4, 3, 1, 2, 2)
    # dst(y,x) samples src(y*3//2, x*4//2) = rows {0,1}, cols {0,2}
    assert list(out) == [px[0], px[2], px[4], px[6]]


def test_resize_rgb_keeps_channels_together():
    px = bytes(range(2 * 1 * 3))  # 2x1 RGB
    out = png.resize_nearest(px, 2, 1, 3, 1, 1)
    assert list(out) == [0, 1, 2]  # whole first pixel, not a byte mix


def test_frames_pack_unpack_roundtrip():
    frames = [png.encode_png(bytes([i] * 6), 3, 2, 1) for i in range(4)]
    assert png.unpack_frames(png.pack_frames(frames)) == frames
    with pytest.raises(png.PngError, match="magic"):
        png.unpack_frames(b"nope")
    with pytest.raises(png.PngError, match="trailing"):
        png.unpack_frames(png.pack_frames(frames) + b"x")


# ---------------------------------------------------------------------------
# pixel rule parity: the numpy generator and the SQL form must agree —
# this is the contract the tier-24 oracles stand on
# ---------------------------------------------------------------------------


def test_pixel_rule_numpy_vs_sql():
    import duckdb

    for doc_id in (0, 1, 7, 12345):
        pixels, w, h = multimodal.synth_pixels(doc_id)
        # cast like the real oracles: doc_id is a BIGINT column there
        # (a bare INT literal would overflow DuckDB's INT32 multiply)
        sql = multimodal.pixel_rule_sql(
            f"CAST({doc_id} AS BIGINT)", "y.y", "x.x")
        rows = duckdb.sql(
            f"SELECT {sql} AS v FROM "
            f"(SELECT unnest(range(0, {h})) AS y) y, "
            f"(SELECT unnest(range(0, {w})) AS x) x "
            f"ORDER BY y.y, x.x").fetchall()
        assert bytes(r[0] for r in rows) == pixels


def test_synth_png_is_real_png_with_cycled_filters():
    blob = multimodal.synth_png(3)
    pixels, w, h, ch = png.decode_png(blob)
    expect, we, he = multimodal.synth_pixels(3)
    assert (pixels, w, h, ch) == (expect, we, he, 1)
    # the encoder must actually have used non-trivial filters: inflate
    # the IDAT and look at the per-scanline filter bytes
    pos, idat = 8, b""
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        if blob[pos + 4:pos + 8] == b"IDAT":
            idat += blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w + 1
    filters = [raw[y * stride] for y in range(h)]
    assert filters == [(3 + y) % 5 for y in range(h)]
