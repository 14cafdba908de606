"""operators/wav.py — RIFF/WAVE PCM16 codec semantics.

PCM is lossless, so the contract is simple: encode -> decode is
BIT-EXACT for every sample layout the encoder can produce, the
decoder survives spec-legal containers other writers produce
(extra chunks, odd-size padding, extensible fmt), and malformed
payloads raise WavError instead of returning garbage.
"""

from __future__ import annotations

import random
import struct

import pytest

from etl_tool_rep_spark.operators.wav import (WavError, _PCM_GUID,
                                              decode_wav_pcm16,
                                              encode_wav_pcm16)


def _pcm(n_frames: int, channels: int = 1, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    vals = [rng.randrange(-32768, 32768)
            for _ in range(n_frames * channels)]
    return struct.pack(f"<{len(vals)}h", *vals)


@pytest.mark.parametrize("channels", [1, 2, 6])
@pytest.mark.parametrize("n_frames", [0, 1, 255, 4096])
def test_round_trip_bit_exact(n_frames, channels):
    pcm = _pcm(n_frames, channels)
    wav = encode_wav_pcm16(pcm, 16000, channels)
    out, rate, ch = decode_wav_pcm16(wav)
    assert (out, rate, ch) == (pcm, 16000, channels)


def test_header_is_canonical_44_bytes():
    pcm = _pcm(10)
    wav = encode_wav_pcm16(pcm, 8000, 1)
    assert len(wav) == 44 + len(pcm)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"


def test_unknown_chunks_are_skipped_with_even_padding():
    pcm = _pcm(5)
    # hand-build: fmt, an odd-sized junk chunk (padded), LIST, data
    junk = struct.pack("<4sI", b"junk", 3) + b"abc" + b"\x00"
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000,
                      16000, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = fmt + junk + lst + data
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, rate, ch = decode_wav_pcm16(wav)
    assert (out, rate, ch) == (pcm, 8000, 1)


def test_extensible_pcm_fmt_accepted():
    pcm = _pcm(4, 2)
    ext = struct.pack("<HHIIHHHHI", 0xFFFE, 2, 44100, 44100 * 4, 4,
                      16, 22, 16, 3) + _PCM_GUID
    body = (struct.pack("<4sI", b"fmt ", len(ext)) + ext
            + struct.pack("<4sI", b"data", len(pcm)) + pcm)
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, rate, ch = decode_wav_pcm16(wav)
    assert (out, rate, ch) == (pcm, 44100, 2)


@pytest.mark.parametrize("mutate, name", [
    (lambda w: w[:10], "truncated header"),
    (lambda w: b"RIFX" + w[4:], "bad magic"),
    (lambda w: w[:36] + b"datA" + w[40:], "no data chunk"),
    (lambda w: w[:22] + b"\x00\x00" + w[24:], "zero channels"),
    (lambda w: w[:34] + b"\x08\x00" + w[36:], "8-bit depth"),
    (lambda w: w[:32] + b"\x05\x00" + w[34:], "bad block align"),
    (lambda w: w[:40] + struct.pack("<I", 1 << 30) + w[44:],
     "data overruns payload"),
])
def test_malformed_payloads_raise(mutate, name):
    wav = encode_wav_pcm16(_pcm(16), 8000, 1)
    with pytest.raises(WavError):
        decode_wav_pcm16(mutate(wav))


def test_data_before_fmt_rejected():
    pcm = _pcm(3)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000,
                      16000, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = data + fmt
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(WavError):
        decode_wav_pcm16(wav)


def test_encoder_rejects_ragged_pcm():
    with pytest.raises(WavError):
        encode_wav_pcm16(b"\x00" * 5, 8000, 1)   # not a frame multiple
    with pytest.raises(WavError):
        encode_wav_pcm16(b"\x00" * 4, 8000, 9)   # channel count
    with pytest.raises(WavError):
        encode_wav_pcm16(b"\x00" * 4, 0, 1)      # sample rate


def test_oversized_data_chunk_refused_before_allocation():
    # a data size field over the cap must raise even if the buffer
    # lies about having that many bytes
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000,
                      16000, 2, 16)
    data_hdr = struct.pack("<4sI", b"data", (1 << 28) + 2)
    body = fmt + data_hdr
    wav = struct.pack("<4sI4s", b"RIFF", (1 << 29), b"WAVE") + body
    with pytest.raises(WavError):
        decode_wav_pcm16(wav)


def test_streaming_writer_riff_size_placeholders():
    """RIFF size 0 / 0xFFFFFFFF (streaming-writer placeholders) must
    decode as 'container extends to payload end'; a data chunk whose
    declared size crosses a REAL container end stays rejected."""
    import struct

    import pytest

    from etl_tool_rep_spark.operators.wav import (WavError,
                                                  decode_wav_pcm16,
                                                  encode_wav_pcm16)

    pcm = struct.pack("<8h", *range(8))
    wav = encode_wav_pcm16(pcm, 8000, channels=1)
    for placeholder in (0, 0xFFFFFFFF):
        patched = wav[:4] + struct.pack("<I", placeholder) + wav[8:]
        got, rate, ch = decode_wav_pcm16(patched)
        assert (got, rate, ch) == (pcm, 8000, 1)
    # real (non-placeholder) RIFF size that truncates the data chunk
    truncated = wav[:4] + struct.pack("<I", 36 + len(pcm) - 2) + wav[8:]
    with pytest.raises(WavError):
        decode_wav_pcm16(truncated)
