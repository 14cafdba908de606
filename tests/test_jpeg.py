"""operators/jpeg.py — baseline grayscale JPEG codec semantics.

Three tiers of guarantees:
* block-constant images with the all-ones quant table round-trip
  BIT-EXACTLY (the property `jpeg_decode_exact`'s oracle gate rests
  on: DC = 8*(v-128) exactly, DC/8 exact in doubles);
* general images with the all-ones table round-trip within the DCT
  rounding bound (|err| <= 2 per pixel);
* the decoder is general within the baseline-grayscale subset:
  real quant tables decode with bounded error, arbitrary AC
  structure (runs, ZRL, EOB) and odd dimensions survive, malformed
  payloads raise JpegError instead of garbage.
"""

from __future__ import annotations

import random

import pytest

from etl_tool_rep_spark.operators.jpeg import (JpegError,
                                               decode_jpeg_gray,
                                               encode_jpeg_gray)


def _block_constant(w, h, seed=7):
    rng = random.Random(seed)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    vals = [[rng.randrange(256) for _ in range(bw)] for _ in range(bh)]
    return bytes(vals[y // 8][x // 8]
                 for y in range(h) for x in range(w))


@pytest.mark.parametrize("w,h", [(8, 8), (16, 24), (40, 8), (24, 16)])
def test_block_constant_roundtrip_exact(w, h):
    px = _block_constant(w, h)
    dec, dw, dh = decode_jpeg_gray(encode_jpeg_gray(px, w, h))
    assert (dw, dh) == (w, h)
    assert dec == px


def test_odd_dimensions_pad_and_crop():
    """Non-multiple-of-8 images are edge-padded at encode and cropped
    at decode; block-constant content still round-trips exactly."""
    px = _block_constant(20, 13)
    dec, dw, dh = decode_jpeg_gray(encode_jpeg_gray(px, 20, 13))
    assert (dw, dh) == (20, 13)
    assert dec == px


def test_general_image_q1_near_lossless():
    rng = random.Random(3)
    w, h = 24, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    dec, _, _ = decode_jpeg_gray(encode_jpeg_gray(px, w, h))
    assert max(abs(a - b) for a, b in zip(px, dec)) <= 2


def test_real_quant_table_decodes_with_bounded_error():
    """A non-trivial quant table exercises the full AC run-length /
    ZRL / EOB paths on both sides; smooth content stays close."""
    w, h = 32, 32
    px = bytes(((x + y) * 4) % 256 for y in range(h) for x in range(w))
    q = [16, 11, 10, 16, 24, 40, 51, 61] * 8     # varied, legal
    dec, _, _ = decode_jpeg_gray(encode_jpeg_gray(px, w, h, quant=q))
    # lossy but sane: mean error small, no wild pixels
    errs = [abs(a - b) for a, b in zip(px, dec)]
    assert sum(errs) / len(errs) < 16
    assert max(errs) < 128


def test_payload_is_real_jfif():
    enc = encode_jpeg_gray(_block_constant(16, 16), 16, 16)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF" in enc[:24]


def test_malformed_payloads_raise():
    with pytest.raises(JpegError):
        decode_jpeg_gray(b"\x00\x01\x02")
    enc = bytearray(encode_jpeg_gray(_block_constant(8, 8), 8, 8))
    with pytest.raises(JpegError):
        decode_jpeg_gray(bytes(enc[:len(enc) // 2]))  # truncated scan
    with pytest.raises(JpegError):
        encode_jpeg_gray(b"\x00" * 10, 4, 4)          # size mismatch


def test_dc_prediction_chains_across_blocks():
    """A gradient of block values makes every DC diff nonzero — a
    decoder that reset the DC predictor would diverge after block 1."""
    w, h = 64, 8
    px = bytes(((x // 8) * 30 + 5) for _ in range(h) for x in range(w))
    dec, _, _ = decode_jpeg_gray(encode_jpeg_gray(px, w, h))
    assert dec == px


# -- round-9 ADVICE robustness: marker-walk + DQT validation ----------


def _find_marker(buf: bytes, marker: int) -> int:
    i = 2
    while i + 4 <= len(buf):
        assert buf[i] == 0xFF
        if buf[i + 1] == marker:
            return i
        seglen = int.from_bytes(buf[i + 2:i + 4], "big")
        i += 2 + seglen
    raise AssertionError(f"marker {marker:#x} not found")


def test_truncated_dqt_raises_jpeg_error():
    """A DQT whose declared length yields <64 quant entries must
    raise JpegError up front, not IndexError mid-decode."""
    enc = bytearray(encode_jpeg_gray(_block_constant(8, 8), 8, 8))
    at = _find_marker(bytes(enc), 0xDB)
    # shrink the DQT body: keep 10 of the 65 payload bytes
    seglen = int.from_bytes(enc[at + 2:at + 4], "big")
    assert seglen == 2 + 65
    truncated = enc[:at + 4] + enc[at + 4:at + 4 + 10] \
        + enc[at + 2 + seglen:]
    truncated[at + 2:at + 4] = (2 + 10).to_bytes(2, "big")
    with pytest.raises(JpegError, match="truncated DQT"):
        decode_jpeg_gray(bytes(truncated))


def test_fill_bytes_before_marker_are_skipped():
    """Spec-legal 0xFF fill bytes between segments (other encoders
    emit them) must not break the marker walk."""
    enc = bytearray(encode_jpeg_gray(_block_constant(16, 8), 16, 8))
    at = _find_marker(bytes(enc), 0xDB)
    padded = enc[:at] + b"\xff\xff\xff" + enc[at:]
    want, _, _ = decode_jpeg_gray(bytes(enc))
    got, w, h = decode_jpeg_gray(bytes(padded))
    assert (got, w, h) == (want, 16, 8)


def test_standalone_tem_marker_is_skipped():
    """TEM (0x01) carries no length field; it must be stepped over,
    not parsed as a length-prefixed segment."""
    enc = bytearray(encode_jpeg_gray(_block_constant(8, 8), 8, 8))
    at = _find_marker(bytes(enc), 0xDB)
    padded = enc[:at] + b"\xff\x01" + enc[at:]
    want, _, _ = decode_jpeg_gray(bytes(enc))
    got, _, _ = decode_jpeg_gray(bytes(padded))
    assert got == want


def test_premature_eoi_raises_named_error():
    enc = bytearray(encode_jpeg_gray(_block_constant(8, 8), 8, 8))
    at = _find_marker(bytes(enc), 0xDB)
    cut = enc[:at] + b"\xff\xd9"
    with pytest.raises(JpegError, match="EOI before SOS"):
        decode_jpeg_gray(bytes(cut))


# -- round-14 vectorization: lock the numpy kernels to the round-13
#    pure-Python implementation via golden digests --------------------


def test_kernels_match_reference():
    """The r14 batched-numpy encoder/decoder must be byte-identical to
    the r13 per-pixel implementation. Golden SHA-256 digests were
    computed from the r13 code (git 0c27773) on an adversarial image:
    a steep gradient (dense ACs, chained DC prediction) plus random
    impulses (long zero runs, ZRL), under both the all-ones table (the
    oracle-exact path) and a real quantization table (full lossy
    path). 200 further randomized shapes were cross-checked old-vs-new
    when the kernels landed; this pins the contract durably."""
    import hashlib
    import random

    rng = random.Random(20260818)
    w, h = 48, 40
    buf = bytearray(((x * 5 + y * 11) % 256)
                    for y in range(h) for x in range(w))
    for _ in range(12):
        buf[rng.randrange(w * h)] = rng.randrange(256)
    px = bytes(buf)
    q = [16, 11, 10, 16, 24, 40, 51, 61] * 8

    e1 = encode_jpeg_gray(px, w, h)
    e2 = encode_jpeg_gray(px, w, h, quant=q)
    assert hashlib.sha256(e1).hexdigest() == (
        "6775ab82803d592d57d55084ead080e19519a3aa9bf0d0d9face146ef140fb47")
    assert hashlib.sha256(e2).hexdigest() == (
        "308a8b7d981094dbec27d87bfd80fbb1f65501c8b4cfe90dee47519bf75c7fff")
    assert hashlib.sha256(decode_jpeg_gray(e1)[0]).hexdigest() == (
        "950fcfb94c58199903104513f8fa125315745c41672156b19ce191f4d718c87a")
    assert hashlib.sha256(decode_jpeg_gray(e2)[0]).hexdigest() == (
        "3a8668caf6a3666ee77df5617e2c7d4b064f7476fd4336e82dec662f7e45ee7e")
