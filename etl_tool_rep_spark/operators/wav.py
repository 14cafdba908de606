"""Pure-stdlib RIFF/WAVE PCM codec — the audio leg of the multimodal
surface (round-9 companion to ``operators/png.py`` / ``jpeg.py``).

Real training corpora carry audio; the container ships no audio
libraries, but WAVE is a fully public container (the Microsoft/IBM
RIFF spec, mirrored by every audio tool): a ``RIFF`` envelope, a
``fmt `` chunk describing the sample format, and a ``data`` chunk of
little-endian PCM frames — all expressible with ``struct`` from the
standard library. This module implements a spec-conformant subset:

* PCM (wFormatTag = 1) and WAVE_FORMAT_EXTENSIBLE (0xFFFE) with the
  PCM sub-format GUID, 16-bit samples, 1..8 channels;
* encoder: canonical 44-byte header, interleaved int16 LE frames;
* decoder: a general RIFF chunk walk (skips LIST/INFO/fact/cue and
  any other chunk, honoring the spec's even-byte chunk padding) and
  ``fmt `` consistency validation (block align, byte rate). Any
  chunk whose declared size crosses the container end is REJECTED
  (``WavError``, never garbage), with one documented accommodation:
  a RIFF size field of 0 or 0xFFFFFFFF — the placeholder streaming
  writers leave when they can't seek back to patch the header — is
  treated as "container extends to the end of the payload".

Exactness note for the oracle gate (``queries/tier42.wav_decode_
exact``): PCM is lossless, so decode(encode(samples)) == samples
bit-for-bit with no construction tricks, and DuckDB can recompute
any integer statistic of the synthetic sample rule without ever
seeing a WAV byte.

Reference parity note: the reference app never touches audio (it is
a CSV/Excel ETL UI, ``/root/reference/main.py:69-94``); this module
backs the multimodal-column mandate of BASELINE.json.

Scale posture: encode/decode cost tracks payload bytes; both
directions run inside Arrow-batched ``mapInPandas`` over binary
columns (one Python crossing per batch), identical to the image
codecs.
"""

from __future__ import annotations

import struct

# hard ceiling on a single clip's decoded PCM buffer (256 MiB): the
# RIFF size fields are attacker-controlled bytes, so the decoder must
# refuse sizes no sane training clip reaches before allocating
_MAX_PCM_BYTES = 256 * 1024 * 1024

# PCM sub-format GUID used by WAVE_FORMAT_EXTENSIBLE (public constant
# KSDATAFORMAT_SUBTYPE_PCM)
_PCM_GUID = bytes.fromhex("0100000000001000800000aa00389b71")


class WavError(ValueError):
    """Malformed or unsupported WAVE payload."""


def encode_wav_pcm16(samples: bytes, sample_rate: int,
                     channels: int = 1) -> bytes:
    """Wrap interleaved little-endian int16 PCM frames in a canonical
    44-byte RIFF/WAVE envelope."""
    if channels < 1 or channels > 8:
        raise WavError(f"unsupported channel count {channels}")
    if sample_rate <= 0:
        raise WavError(f"bad sample rate {sample_rate}")
    block = 2 * channels
    if len(samples) % block:
        raise WavError("PCM byte length not a multiple of block align")
    byte_rate = sample_rate * block
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(samples), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, block, 16,
        b"data", len(samples))
    return hdr + samples


def decode_wav_pcm16(payload: bytes) -> tuple[bytes, int, int]:
    """Parse a RIFF/WAVE payload; return ``(pcm, sample_rate,
    channels)`` where ``pcm`` is interleaved int16 LE frames.

    General chunk walk: any chunk other than ``fmt ``/``data`` is
    skipped (with the RIFF even-byte pad), ``fmt `` must precede
    ``data``, and every size field is validated against the buffer
    before use."""
    if len(payload) < 12:
        raise WavError("payload shorter than a RIFF header")
    riff, riff_size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    if riff_size in (0, 0xFFFFFFFF):
        # streaming-writer placeholder: the writer never patched the
        # header, so the container is the whole payload
        end = len(payload)
    else:
        end = min(len(payload), 8 + riff_size)
    pos = 12
    fmt = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body_at = pos + 8
        if body_at + size > end:
            raise WavError(f"chunk {cid!r} overruns the payload")
        if cid == b"fmt ":
            fmt = _parse_fmt(payload[body_at:body_at + size])
        elif cid == b"data":
            if fmt is None:
                raise WavError("data chunk before fmt chunk")
            if size > _MAX_PCM_BYTES:
                raise WavError(f"PCM payload too large ({size} bytes)")
            channels, sample_rate, block = fmt
            if size % block:
                raise WavError("data length not a multiple of "
                               "block align")
            return payload[body_at:body_at + size], sample_rate, channels
        # skip unknown chunk (LIST, fact, cue , ...) with even padding
        pos = body_at + size + (size & 1)
        continue
    raise WavError("no data chunk found")


def _parse_fmt(body: bytes) -> tuple[int, int, int]:
    """Validate a ``fmt `` chunk; return (channels, rate, block)."""
    if len(body) < 16:
        raise WavError("truncated fmt chunk")
    (tag, channels, sample_rate, byte_rate, block,
     bits) = struct.unpack_from("<HHIIHH", body, 0)
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format is a GUID at
        # offset 24 of the extension (public layout)
        if len(body) < 40:
            raise WavError("truncated extensible fmt chunk")
        if body[24:40] != _PCM_GUID:
            raise WavError("extensible sub-format is not PCM")
    elif tag != 1:
        raise WavError(f"unsupported format tag {tag} (PCM only)")
    if bits != 16:
        raise WavError(f"unsupported bit depth {bits} (16-bit only)")
    if channels < 1 or channels > 8:
        raise WavError(f"unsupported channel count {channels}")
    if sample_rate <= 0:
        raise WavError(f"bad sample rate {sample_rate}")
    if block != 2 * channels:
        raise WavError(f"block align {block} inconsistent with "
                       f"{channels} x 16-bit")
    if byte_rate != sample_rate * block:
        raise WavError("byte rate inconsistent with rate x block")
    return channels, sample_rate, block
