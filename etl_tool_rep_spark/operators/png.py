"""Pure-stdlib PNG codec (encode + decode) for the multimodal surface.

The container ships no image libraries (no PIL/Pillow), but PNG is a
fully public spec (RFC 2083 / W3C PNG): zlib-compressed scanlines, five
per-scanline predictive filters, CRC-32 chunk framing — all expressible
with ``zlib``/``struct``/``binascii`` from the standard library. This
module implements a real, spec-conformant subset:

* color types 0 (8-bit grayscale) and 2 (8-bit truecolor RGB),
  non-interlaced;
* all five scanline filters (None / Sub / Up / Average / Paeth) on both
  the encode and decode side;
* CRC validation, IHDR sanity checks, multi-IDAT reassembly.

This is what un-stubs ``operators/multimodal.py``'s decode path: the
decode stage inside the Arrow-batched ``mapInPandas`` operators now
parses actual compressed PNG bytes and emits actual pixel values, and
the exact-oracle queries in ``queries/tier24.py`` certify the
encode→decode round trip bit-for-bit against DuckDB's independent
recomputation of the pixel rule.

Reference parity note: the reference app never decodes images (it is a
CSV/Excel ETL UI, ``/root/reference/main.py:69-94``); this module backs
the multimodal-column mandate of BASELINE.json, not a reference
operator.

Scale posture: encode/decode cost tracks payload bytes. Both directions
run inside mapInPandas over binary columns, one Python crossing per
Arrow batch; repartition by a size-balanced key before the decode stage
when payload sizes are skewed (SCALE.md §multimodal).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> bytes per pixel (8-bit depth only)
_BPP = {0: 1, 2: 3}

# hard ceiling on a single image's decoded pixel buffer (256 MiB):
# IHDR dimensions are attacker-controlled bytes, so the decoder must
# refuse sizes no sane training image reaches before allocating
_MAX_PIXEL_BYTES = 256 * 1024 * 1024


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))


def _filter_scanline(ftype: int, raw: bytes, prior: bytes,
                     bpp: int) -> bytes:
    """Apply filter ``ftype`` to one raw scanline (encode side)."""
    n = len(raw)
    out = bytearray(n)
    if ftype == 0:                                    # None
        return bytes(raw)
    if ftype == 1:                                    # Sub
        for i in range(n):
            left = raw[i - bpp] if i >= bpp else 0
            out[i] = (raw[i] - left) & 0xFF
    elif ftype == 2:                                  # Up
        for i in range(n):
            out[i] = (raw[i] - prior[i]) & 0xFF
    elif ftype == 3:                                  # Average
        for i in range(n):
            left = raw[i - bpp] if i >= bpp else 0
            out[i] = (raw[i] - ((left + prior[i]) >> 1)) & 0xFF
    elif ftype == 4:                                  # Paeth
        for i in range(n):
            left = raw[i - bpp] if i >= bpp else 0
            ul = prior[i - bpp] if i >= bpp else 0
            out[i] = (raw[i] - _paeth(left, prior[i], ul)) & 0xFF
    else:
        raise PngError(f"unknown filter type {ftype}")
    return bytes(out)


def _unfilter_scanline(ftype: int, filt: bytes, prior: bytes,
                       bpp: int) -> bytes:
    """Invert filter ``ftype`` on one scanline (decode side)."""
    n = len(filt)
    out = bytearray(n)
    if ftype == 0:                                    # None
        return bytes(filt)
    if ftype == 1:                                    # Sub
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (filt[i] + left) & 0xFF
    elif ftype == 2:                                  # Up
        for i in range(n):
            out[i] = (filt[i] + prior[i]) & 0xFF
    elif ftype == 3:                                  # Average
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (filt[i] + ((left + prior[i]) >> 1)) & 0xFF
    elif ftype == 4:                                  # Paeth
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            ul = prior[i - bpp] if i >= bpp else 0
            out[i] = (filt[i] + _paeth(left, prior[i], ul)) & 0xFF
    else:
        raise PngError(f"unknown filter type {ftype}")
    return bytes(out)


def encode_png(pixels, width: int, height: int, channels: int = 1,
               filter_choice=None, compress_level: int = 6) -> bytes:
    """Encode a pixel buffer as a spec-conformant PNG.

    ``pixels``: bytes-like of length height*width*channels, row-major.
    ``channels``: 1 (grayscale, color type 0) or 3 (RGB, color type 2).
    ``filter_choice``: None for filter 0 everywhere, an int 0-4 for a
    fixed filter, or a callable ``row_index -> int`` (used by the
    oracle fixtures to exercise every filter deterministically).
    """
    if channels == 1:
        ctype = 0
    elif channels == 3:
        ctype = 2
    else:
        raise PngError(f"unsupported channel count {channels}")
    pixels = bytes(pixels)
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{stride * height} for {width}x{height}x{channels}")
    if filter_choice is None:
        pick = lambda y: 0                            # noqa: E731
    elif callable(filter_choice):
        pick = filter_choice
    else:
        pick = lambda y: int(filter_choice)           # noqa: E731

    prior = bytes(stride)
    lines = bytearray()
    for y in range(height):
        raw = pixels[y * stride:(y + 1) * stride]
        f = pick(y)
        lines.append(f)
        lines += _filter_scanline(f, raw, prior, channels)
        prior = raw

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    idat = zlib.compress(bytes(lines), compress_level)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[bytes, int, int, int]:
    """Decode a PNG payload -> (pixels, width, height, channels).

    Supports non-interlaced 8-bit grayscale / truecolor; validates the
    signature, chunk CRCs, and IHDR parameters. Raises PngError on
    anything malformed or out of the supported subset.
    """
    if payload[:8] != _SIGNATURE:
        raise PngError("bad PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk data")
        if pos + 12 + length > len(payload):
            raise PngError("truncated chunk crc")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data))
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _BPP:
                raise PngError(f"unsupported color type {color}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNGs not supported")
            channels = _BPP[color]
            # declared-size ceiling: a hostile tiny payload must not be
            # able to command an unbounded allocation in the decode
            # stage (pixel buffers are per-Arrow-batch, in-executor)
            if width * height * channels > _MAX_PIXEL_BYTES:
                raise PngError(
                    f"declared image size {width}x{height}x{channels} "
                    f"exceeds the {_MAX_PIXEL_BYTES}-byte decode ceiling")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped per spec
    if width < 0:
        raise PngError("missing IHDR")
    if not seen_end:
        raise PngError("missing IEND")
    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: never allocate more than the IHDR-declared size
    # plus one probe byte, regardless of what the stream would expand to
    # (zlib-bomb defense — plain zlib.decompress inflates fully first)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"corrupt IDAT stream: {e}") from e
    if d.unconsumed_tail:
        raw += d.decompress(d.unconsumed_tail, 1)
    if len(raw) != expected:
        raise PngError(
            f"decompressed stream is {'>' if len(raw) > expected else ''}"
            f"{len(raw)} bytes, expected {expected}")
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        line = _unfilter_scanline(
            raw[off], raw[off + 1:off + 1 + stride], prior, channels)
        out[y * stride:(y + 1) * stride] = line
        prior = line
    return bytes(out), width, height, channels


def resize_nearest(pixels: bytes, width: int, height: int,
                   channels: int, new_width: int,
                   new_height: int) -> bytes:
    """Nearest-neighbor resize on a raw pixel buffer: destination
    pixel (y, x) samples source (y*height//new_height,
    x*width//new_width) — pure integer arithmetic, so the exact
    oracle (tier24) recomputes it in SQL."""
    out = bytearray(new_width * new_height * channels)
    for y in range(new_height):
        sy = y * height // new_height
        src_row = sy * width * channels
        dst_row = y * new_width * channels
        for x in range(new_width):
            sx = x * width // new_width
            for c in range(channels):
                out[dst_row + x * channels + c] = (
                    pixels[src_row + sx * channels + c])
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal multi-frame container ("video" stand-in): a public, trivially
# parseable framing of N PNG frames — magic + count + length-prefixed
# frames. Real deployments would use a real container (mp4/webm) via an
# optional decoder; the Spark-side plumbing (binary in -> exploded
# frames out of mapInPandas) is identical.
# ---------------------------------------------------------------------------

_FRAMES_MAGIC = b"FRMS"


def pack_frames(frames: list[bytes]) -> bytes:
    """Pack PNG frames into the length-prefixed FRMS container."""
    out = bytearray(_FRAMES_MAGIC)
    out += struct.pack(">I", len(frames))
    for fr in frames:
        out += struct.pack(">I", len(fr))
        out += fr
    return bytes(out)


def unpack_frames(payload: bytes) -> list[bytes]:
    """Unpack a FRMS container into its PNG frame payloads."""
    if payload[:4] != _FRAMES_MAGIC:
        raise PngError("bad FRMS magic")
    (count,) = struct.unpack(">I", payload[4:8])
    pos = 8
    frames = []
    for _ in range(count):
        if pos + 4 > len(payload):
            raise PngError("truncated frame header")
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        pos += 4
        fr = payload[pos:pos + ln]
        if len(fr) != ln:
            raise PngError("truncated frame payload")
        frames.append(fr)
        pos += ln
    if pos != len(payload):
        raise PngError("trailing bytes after last frame")
    return frames
