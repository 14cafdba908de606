"""Pure-stdlib baseline JPEG codec (grayscale) for the multimodal
surface — the round-8 companion to ``operators/png.py``.

Real training corpora are JPEG-heavy; the container ships no image
libraries, but baseline JPEG is a fully public spec (ITU-T T.81 /
ISO 10918-1): 8x8 block DCT, uniform quantization, zigzag ordering,
canonical Huffman entropy coding with byte stuffing — all expressible
with ``math``/``struct`` from the standard library. This module
implements a spec-conformant subset:

* SOF0 baseline DCT, single component (8-bit grayscale), no
  subsampling, no restart markers;
* encoder: edge-replicated block padding, exact float fDCT,
  round-half-away quantization, DC prediction, full AC run-length /
  ZRL / EOB coding with the T.81 Annex K luminance Huffman tables;
* decoder: general marker walk (skips APPn/COM), arbitrary DQT/DHT
  (it does NOT assume the Annex K tables), canonical Huffman decode
  with byte unstuffing, dequantize, float IDCT, level shift + clamp.

Exactness note for the oracle gate (``queries/tier40.jpeg_decode_
exact``): JPEG is lossy in general, so cross-engine certification
uses BLOCK-CONSTANT synthetic images and an all-ones quantization
table. For a constant block the forward DCT is exactly
``DC = 8 * (v - 128)`` with every AC zero, and the float IDCT of a
DC-only block is ``DC / 8`` — exact in IEEE doubles because DC is a
multiple of 8 — so decode(encode(img)) == img BIT-FOR-BIT through
the fully general code paths, and DuckDB can recompute the expected
pixel stats from the block rule without ever touching a file. The
general lossy path is covered by pytest round-trip tolerance tests.

Reference parity note: the reference app never decodes images (it is
a CSV/Excel ETL UI, ``/root/reference/main.py:69-94``); this module
backs the multimodal-column mandate, not a reference operator.

Scale posture: same as PNG — encode/decode cost tracks payload
bytes, one Python crossing per Arrow batch inside mapInPandas.
"""

from __future__ import annotations

import math
import struct

_MAX_PIXEL_BYTES = 256 * 1024 * 1024


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# -- T.81 Annex K luminance Huffman tables (public spec constants) ---

_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:                 # byte stuffing
                self.buf.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)    # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise JpegError("truncated after 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1            # stuffed byte
                else:
                    raise JpegError(
                        f"unexpected marker 0xFF{marker:02X} in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s unsigned bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


try:                                   # vectorized transform kernels
    import numpy as _np
    _NP_COS = _np.array(_COS)          # [x][u]
    _NP_CC = 0.25 * _np.outer(_C, _C)  # [u][v] scale
except ImportError:                    # pragma: no cover — stdlib-only
    _np = None


def _fdct(block: list[float]) -> list[float]:
    """Forward 8x8 DCT (T.81 A.3.3). The numpy path computes the same
    sums as matrix products — for the block-constant inputs the
    exact-oracle key feeds in, the DC is a sum of 64 equal small
    integers (exact in doubles in any order) and every AC magnitude
    is ~1e-13, far under the 0.5 quantization threshold, so the
    QUANTIZED output is bit-identical to the loop form; general
    inputs are covered by the pytest tolerance contract."""
    if _np is not None:
        b = _np.asarray(block, dtype=_np.float64).reshape(8, 8)
        s = _NP_COS.T @ b.T @ _NP_COS      # s[u][v] = sum b*cosx*cosy
        return (_NP_CC * s).T.reshape(64).tolist()
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[y * 8 + x] * _COS[x][u] * _COS[y][v]
            out[v * 8 + u] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    """Inverse 8x8 DCT. numpy path: for DC-only blocks every pixel's
    sum has ONE nonzero term (DC/8 — exact in doubles), so the gate
    inputs decode bit-identically; general blocks fall under the
    lossy tolerance contract."""
    if _np is not None:
        c = (_NP_CC * _np.asarray(coef, dtype=_np.float64)
             .reshape(8, 8).T)             # [u][v] scaled
        out = _NP_COS @ c @ _NP_COS.T      # [x][y]
        return out.T.reshape(64).tolist()
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (_C[u] * _C[v] * coef[v * 8 + u]
                          * _COS[x][u] * _COS[y][v])
            out[y * 8 + x] = 0.25 * s
    return out


def encode_jpeg_gray(pixels: bytes, width: int, height: int,
                     quant: list[int] | None = None) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as a baseline JFIF
    JPEG with the Annex K Huffman tables and the given 64-entry
    quantization table (default all-ones — numerically transparent,
    the configuration the exact-oracle queries rely on)."""
    if len(pixels) != width * height:
        raise JpegError("pixel buffer does not match dimensions")
    if not (0 < width < 65536 and 0 < height < 65536):
        raise JpegError("bad dimensions")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not 1 <= x <= 255 for x in q):
        raise JpegError("quant table must be 64 values in 1..255")

    bw, bh = (width + 7) // 8, (height + 7) // 8
    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append(float(pixels[sy * width + sx]) - 128.0)
            coef = _fdct(block)
            zz = [0] * 64
            for i in range(64):
                c = coef[_ZIGZAG[i]] / q[i]
                # round half away from zero (not banker's)
                zz[i] = int(math.floor(c + 0.5)) if c >= 0 \
                    else -int(math.floor(-c + 0.5))
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = _category(diff)
            w.put(*_DC_ENC[s])
            if s:
                w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    w.put(*_AC_ENC[0xF0])    # ZRL
                    run -= 16
                s = _category(zz[i])
                w.put(*_AC_ENC[(run << 4) | s])
                w.put(zz[i] if zz[i] > 0 else zz[i] + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                w.put(*_AC_ENC[0x00])        # EOB
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th] + bits + vals)

    zq = bytes([0]) + bytes(q[i] for i in range(64))
    out = bytearray(b"\xff\xd8")                         # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, zq)                               # DQT
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
               + bytes([1, 0x11, 0]))                    # SOF0
    out += seg(0xFFC4, dht(0x00, _DC_BITS, _DC_VALS))    # DHT DC
    out += seg(0xFFC4, dht(0x10, _AC_BITS, _AC_VALS))    # DHT AC
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))    # SOS
    out += w.buf
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


def _decode_huff_tables(payload: bytes) -> dict:
    """One DHT segment may carry several tables."""
    tables, i = {}, 0
    while i < len(payload):
        tc_th = payload[i]
        bits = list(payload[i + 1:i + 17])
        n = sum(bits)
        vals = list(payload[i + 17:i + 17 + n])
        if len(vals) != n:
            raise JpegError("truncated DHT")
        # decode map: (length, code) -> symbol
        dec, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                dec[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        tables[tc_th] = dec
        i += 17 + n
    return tables


def _read_huff(r: _BitReader, dec: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.bit()
        length += 1
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def decode_jpeg_gray(payload: bytes) -> tuple[bytes, int, int]:
    """Decode a baseline single-component (grayscale) JPEG. Returns
    (pixels row-major, width, height). General within the subset:
    arbitrary quant/Huffman tables, any AC structure, APPn/COM
    segments skipped."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("missing SOI")
    i = 2
    quant: dict[int, list[int]] = {}
    huff: dict[int, dict] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    while True:
        if i + 2 > len(payload):
            raise JpegError("truncated before SOS")
        if payload[i] != 0xFF:
            raise JpegError("bad marker alignment")
        # spec-legal 0xFF fill bytes may pad the gap before a marker
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(payload):
            raise JpegError("truncated before SOS")
        marker = payload[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:      # TEM / RSTn
            i += 2            # standalone markers carry no length
            continue
        if marker == 0xD9:
            raise JpegError("EOI before SOS")
        if i + 4 > len(payload):
            raise JpegError("truncated before SOS")
        seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if seglen < 2:
            raise JpegError("bad segment length")
        body = payload[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:                                # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant unsupported")
                quant[tq] = list(body[j + 1:j + 65])
                if len(quant[tq]) != 64:
                    raise JpegError("truncated DQT")
                j += 65
        elif marker == 0xC4:                              # DHT
            huff.update(_decode_huff_tables(body))
        elif marker == 0xC0:                              # SOF0
            prec, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise JpegError("only 8-bit single-component baseline")
            if body[7] != 0x11:
                raise JpegError("subsampling unsupported")
            comp_q = body[8]
            if width * height > _MAX_PIXEL_BYTES:
                raise JpegError("image too large")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline SOF unsupported")
        elif marker == 0xDA:                              # SOS
            if width is None:
                raise JpegError("SOS before SOF0")
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0x0F
            break
        # APPn / COM / others: skipped
    q = quant.get(comp_q)
    dc_tab = huff.get(0x00 | comp_dc)
    ac_tab = huff.get(0x10 | comp_ac)
    if q is None or dc_tab is None or ac_tab is None:
        raise JpegError("missing tables")

    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = bytearray(width * height)
    r = _BitReader(payload, i)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            s = _read_huff(r, dc_tab)
            diff = _extend(r.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_huff(r, ac_tab)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:            # ZRL
                        k += 16
                        continue
                    break                    # EOB
                k += run
                if k > 63:
                    raise JpegError("AC index out of range")
                zz[k] = _extend(r.bits(size), size)
                k += 1
            coef = [0.0] * 64
            for j in range(64):
                coef[_ZIGZAG[j]] = float(zz[j] * q[j])
            block = _idct(coef)
            for y in range(8):
                sy = by * 8 + y
                if sy >= height:
                    break
                for x in range(8):
                    sx = bx * 8 + x
                    if sx >= width:
                        continue
                    v = int(math.floor(block[y * 8 + x] + 128.5))
                    out[sy * width + sx] = 0 if v < 0 \
                        else 255 if v > 255 else v
    return bytes(out), width, height
