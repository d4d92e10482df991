"""ADTS transport parsing: probe, header parse, frame segmentation, cookie.

Reproduces the behavior of the reference adts_demuxer.js:
  - probe scans 16-bit words for the 0xFFFx syncword without moving the
    stream position (adts_demuxer.js:7-20),
  - readHeader parses the 7/9-byte header (adts_demuxer.js:28-52),
  - a 2-byte AudioSpecificConfig "magic cookie" is synthesized from the
    header fields (adts_demuxer.js:66-70).

Additionally provides frame segmentation (split a byte stream into ADTS
frames by walking frameLength), which the reference delegates to the decoder
re-reading headers inline (decoder.js:128-130) — our batched runtime needs
explicit frame boundaries up front.
"""
from __future__ import annotations

from dataclasses import dataclass

from aacjax.host.bitio import BitReader, BitstreamError


@dataclass(frozen=True)
class ADTSHeader:
    profile: int           # MPEG-4 audioObjectType (profile bits + 1)
    sampling_index: int
    chan_config: int
    frame_length: int      # whole ADTS frame incl. header, bytes
    num_frames: int        # raw_data_blocks in frame (usually 1)
    protection_absent: bool
    header_bytes: int      # 7 or 9


def probe(data: bytes) -> bool:
    """True if an ADTS syncword appears on any 16-bit-aligned scan position.

    Mirrors adts_demuxer.js:7-20: scans consecutive u16 reads (i.e. even
    byte offsets) for (word & 0xfff6) == 0xfff0.
    """
    for i in range(0, len(data) - 1, 2):
        word = (data[i] << 8) | data[i + 1]
        if (word & 0xFFF6) == 0xFFF0:
            return True
    return False


def read_header(stream: BitReader) -> ADTSHeader:
    """Parse one ADTS header at the current position (adts_demuxer.js:28-52)."""
    if stream.read(12) != 0xFFF:
        raise BitstreamError("Invalid ADTS header.")
    stream.advance(3)                       # MPEG version + layer
    protection_absent = bool(stream.read(1))
    profile = stream.read(2) + 1
    sampling_index = stream.read(4)
    stream.advance(1)                       # private
    chan_config = stream.read(3)
    stream.advance(4)                       # original/copy, home, (c), (c) start
    frame_length = stream.read(13)
    stream.advance(11)                      # buffer fullness
    num_frames = stream.read(2) + 1
    if not protection_absent:
        stream.advance(16)                  # CRC
    return ADTSHeader(
        profile=profile,
        sampling_index=sampling_index,
        chan_config=chan_config,
        frame_length=frame_length,
        num_frames=num_frames,
        protection_absent=protection_absent,
        header_bytes=7 if protection_absent else 9,
    )


def synthesize_cookie(header: ADTSHeader) -> bytes:
    """2-byte AudioSpecificConfig from ADTS fields (adts_demuxer.js:66-70)."""
    b0 = ((header.profile << 3) | ((header.sampling_index >> 1) & 7)) & 0xFF
    b1 = (((header.sampling_index & 1) << 7) | (header.chan_config << 3)) & 0xFF
    return bytes([b0, b1])


def split_frames(data: bytes, start: int = 0,
                 resync_overruns: bool = False
                 ) -> list[tuple[ADTSHeader, int, int]]:
    """Segment `data` into ADTS frames.

    Returns a list of (header, payload_start, payload_end) byte ranges, where
    the payload is the raw_data_block bytes (header/CRC stripped).  Resyncs
    to the next syncword on malformed lengths, which the reference does not
    attempt (its probe scan is the only sync logic — SURVEY.md §5).

    A frame whose length runs past the end of `data` is normally treated
    as a truncated tail (more data may arrive in a streaming feed) and
    segmentation stops; with resync_overruns=True it is treated as a false
    syncword (e.g. 0xFF bytes inside a corrupt payload) and the scan
    continues from the next byte — use when `data` is known complete.
    """
    frames = []
    pos = start
    n = len(data)
    while pos + 7 <= n:
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xF6) == 0xF0):
            pos += 1  # resync scan
            continue
        stream = BitReader(memoryview(data)[pos:pos + 9])
        try:
            header = read_header(stream)
        except BitstreamError:
            pos += 1
            continue
        if header.frame_length < header.header_bytes:
            pos += 1  # malformed length: resync scan from the next byte
            continue
        end = pos + header.frame_length
        if end > n:
            if resync_overruns:
                pos += 1
                continue
            break  # truncated trailing frame (more data may arrive)
        frames.append((header, pos + header.header_bytes, end))
        pos = end
    return frames


def wrap_frame(payload: bytes, config) -> bytes:
    """Wrap a raw_data_block in a 7-byte ADTS header — the inverse of
    split_frames for configs ADTS can signal (used e.g. to route LATM
    payloads through the batched ADTS decode path)."""
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    length = len(payload) + 7
    w.write(0xFFF, 12)
    w.write(0b000, 3)            # MPEG-4, layer 00
    w.write(1, 1)                # protection_absent
    w.write(config.profile - 1, 2)
    w.write(config.sample_index, 4)
    w.write(0, 1)                # private
    w.write(config.chan_config, 3)
    w.write(0, 4)                # original/home/(c)/(c)start
    w.write(length, 13)
    w.write(0x7FF, 11)           # buffer fullness (VBR)
    w.write(0, 2)                # numFrames - 1
    return w.getvalue() + payload
