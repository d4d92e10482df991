"""Public API, mirroring the reference decoder's surface.

Reference mapping (SURVEY.md §1 L6):
  AV.Decoder.register('mp4a'/'aac ')  -> codec ids accepted by AACDecoder
  decoder.setCookie(buffer)           -> AACDecoder.set_cookie / setCookie
  decoder.readChunk()                 -> AACDecoder.read_chunk / readChunk
                                         (interleaved Float32, 1/32768 scale,
                                          1024*channels samples per call —
                                          decoder.js:204-215)
  ADTSDemuxer.probe(stream)           -> probe(bytes)
  format.floatingPoint = true         -> output is always float32

decode_adts() is the batched fast path: whole-file decode through the
device pipeline in T-frame chunks.
"""
from __future__ import annotations

import numpy as np

from aacjax.host import adts
from aacjax.host.asc import StreamConfig, UnsupportedError, parse_asc
from aacjax.runtime.batch import BatchDecoder

CODEC_IDS = ('mp4a', 'aac ')
FRAME = 1024

probe = adts.probe


class AACDecoder:
    """Streaming decoder with reference-equivalent semantics.

    Usage:
        dec = AACDecoder()
        dec.set_cookie(asc_bytes)      # or feed ADTS data and skip this
        dec.feed(adts_or_raw_bytes)
        pcm = dec.read_chunk()         # Float32 [1024*channels], interleaved
    """

    floating_point = True  # init() sets format.floatingPoint (decoder.js:49-51)

    def __init__(self, cookie: bytes | None = None, cce_slots: int = 2):
        self.config: StreamConfig | None = None
        self._buffer = bytearray()
        self._pos = 0  # byte offset of next un-decoded ADTS frame
        self._runtime: BatchDecoder | None = None
        self._cce_slots = cce_slots

    # -- reference-named aliases -------------------------------------------
    def setCookie(self, buffer: bytes) -> None:  # noqa: N802
        self.set_cookie(buffer)

    def readChunk(self) -> np.ndarray:  # noqa: N802
        return self.read_chunk()

    # -- configuration -------------------------------------------------------
    def set_cookie(self, buffer: bytes) -> None:
        """Parse an AudioSpecificConfig (decoder.js:53-113)."""
        self.config = parse_asc(buffer)
        self._runtime = BatchDecoder([self.config], chunk_frames=1,
                                     cce_slots=self._cce_slots)

    def feed(self, data: bytes) -> None:
        self._buffer.extend(data)
        if self.config is None:
            # Auto-configure from the first ADTS header, like the demuxer's
            # synthesized cookie (adts_demuxer.js:66-70).
            frames = adts.split_frames(bytes(self._buffer))
            if frames:
                header = frames[0][0]
                self.set_cookie(adts.synthesize_cookie(header))

    # -- decoding -------------------------------------------------------------
    def read_chunk(self) -> np.ndarray | None:
        """Decode the next frame; returns interleaved float32 PCM of
        1024*channels samples (1/32768 scale), or None if no complete
        frame is buffered."""
        if self.config is None or self._runtime is None:
            raise UnsupportedError("no configuration; call set_cookie or feed")
        data = bytes(self._buffer)
        frames = adts.split_frames(data, start=self._pos)
        if not frames:
            # raw (non-ADTS) payload: treat the whole remaining buffer as
            # one raw_data_block, as the reference does when the 12-bit
            # peek is not a syncword (decoder.js:128-130).
            if self._pos >= len(data):
                return None
            payload = data[self._pos:]
            self._pos = len(data)
        else:
            header, start, end = frames[0]
            # the decoder re-reads interleaved headers itself, so hand it
            # the payload only
            payload = data[start:end]
            self._pos = end
        parsed = self._runtime.parse_stream_frames(0, [payload])
        pcm = self._runtime.step([parsed])
        out = self._runtime.stream_pcm(pcm, 0, 1)
        return out.reshape(-1)


def decode_adts(data: bytes, chunk_frames: int = 64,
                cce_slots: int = 0) -> tuple[np.ndarray, int]:
    """Decode a whole ADTS byte stream through the batched device pipeline.

    Returns (pcm [total_samples, channels] float32 in 1/32768 scale,
    sample_rate).
    """
    frames = adts.split_frames(data)
    if not frames:
        raise UnsupportedError("no ADTS frames found")
    header = frames[0][0]
    config = parse_asc(adts.synthesize_cookie(header))
    dec = BatchDecoder([config], chunk_frames=chunk_frames,
                       cce_slots=cce_slots)
    payloads = [data[s:e] for _, s, e in frames]
    out = []
    for i in range(0, len(payloads), chunk_frames):
        group = payloads[i:i + chunk_frames]
        pcm = dec.step_raw([group])
        if dec.streams[0].failed:
            raise UnsupportedError(
                f"stream failed: {dec.streams[0].last_error}")
        out.append(dec.stream_pcm(pcm, 0, len(group)))
    return np.concatenate(out, axis=0), config.sample_rate
