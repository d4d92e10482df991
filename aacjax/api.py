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
from aacjax.host.bitio import (BitReader, BitstreamError,
                               BitstreamUnderflow)
from aacjax.host.syntax import decode_frame
from aacjax.runtime.batch import BatchDecoder

CODEC_IDS = ('mp4a', 'aac ')
FRAME = 1024

probe = adts.probe

# AAC decodes channels in element order (C, L, R, SL, SR, LFE for 5.1 —
# the reference's convention, decoder.js:218-248); WAV/FFmpeg use the
# canonical speaker order.  Permutations indexed by chanConfig:
# canonical[i] = element_order[CANONICAL_ORDER[cfg][i]].
CANONICAL_ORDER = {
    1: [0],
    2: [0, 1],
    3: [1, 2, 0],                 # L R C
    4: [1, 2, 0, 3],              # L R C rear-mono
    5: [1, 2, 0, 3, 4],           # L R C SL SR
    6: [1, 2, 0, 5, 3, 4],        # L R C LFE SL SR
    # chanConfig 7 is spec 7.1 (ISO/IEC 14496-3 Table 1.19): element order
    # C, FLC, FRC, FL, FR, BL, BR, LFE -> FL FR C LFE BL BR FLC FRC
    7: [3, 4, 0, 7, 5, 6, 1, 2],
    8: [1, 2, 0, 7, 5, 6, 3, 4],  # L R C LFE SL SR (side pair first)
    # 11 = 6.1: elements C, L/R, BL/BR, BC, LFE; libavcodec output order
    # pinned empirically (spectral markers): L R C LFE BL BR BC
    11: [1, 2, 0, 6, 3, 4, 5],
    # 12 = 7.1 (back): elements C, L/R, SL/SR, BL/BR, LFE — same output
    # permutation as config 8
    12: [1, 2, 0, 7, 5, 6, 3, 4],
    # 13 = 22.2 (Amd.4): 16 elements / 24 channels; permutation pinned
    # empirically against libavcodec with per-channel spectral markers
    13: [3, 4, 0, 10, 7, 8, 1, 2, 9, 11, 5, 6, 13, 14, 12, 17, 18, 19,
         15, 16, 20, 21, 22, 23],
}


def to_canonical_order(pcm: np.ndarray, chan_config: int) -> np.ndarray:
    """Reorder element-order channels to the canonical WAV/FFmpeg layout."""
    perm = CANONICAL_ORDER.get(chan_config)
    return pcm[:, perm] if perm else pcm


class AACDecoder:
    """Streaming decoder with reference-equivalent semantics.

    Consumes a continuous bitstream exactly like the reference readChunk
    loop (decoder.js:125-216): each call decodes one raw_data_block from
    the current bit position, consuming an interleaved ADTS header first
    when one is present — so multi-raw_data_block ADTS frames
    (numFrames > 1) and raw m4a-style streams both work.

    Usage:
        dec = AACDecoder()
        dec.set_cookie(asc_bytes)      # or feed ADTS data and skip this
        dec.feed(adts_or_raw_bytes)
        pcm = dec.read_chunk()         # Float32 [1024*channels], interleaved
    """

    floating_point = True  # init() sets format.floatingPoint (decoder.js:49-51)

    def __init__(self, cookie: bytes | None = None, cce_slots: int = 2,
                 use_native: bool | None = None, drc_scale: float = 0.0):
        self.drc_scale = drc_scale
        self.config: StreamConfig | None = None
        self._buffer = bytearray()
        self._bitpos = 0  # bit offset of the next un-decoded raw_data_block
        self._reader: BitReader | None = None
        self._runtime: BatchDecoder | None = None
        self._cce_slots = cce_slots
        self._use_native = use_native  # None = auto (native when built)
        # HE-AAC SBR: None = not yet known (implicit signaling detects it
        # on the first parsed frame), True/False once known
        self._sbr_mode: bool | None = None
        self._sbr_ctx = None
        self._sbr_procs: list = []
        # Parametric Stereo (HE-AAC v2): (PSProc, right-channel synthesis
        # state) once ps_data has been seen; stays stereo thereafter
        self._ps_state: tuple | None = None
        # protected multi-rdb ADTS bookkeeping (13818-7 §6.2): the parser
        # records blocks-remaining / per-block-crc per frame here, and
        # the flag gates the native streaming fast path off for streams
        # whose blocks carry trailing crc_check words
        self._adts_state: dict = {}
        self._multi_rdb_crc = False
        if cookie is not None:
            self.set_cookie(cookie)

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
                                     cce_slots=self._cce_slots,
                                     use_native=self._use_native,
                                     drc_scale=self.drc_scale)
        if self.config.sbr:
            self._sbr_mode = True  # explicit signaling

    def feed(self, data: bytes) -> None:
        if getattr(self, "_transport", None) == "loas":
            self._feed_loas(data)
            return
        self._buffer.extend(data)
        self._reader = None  # buffer changed; rebuild lazily
        if self.config is None and getattr(self, "_transport", None) is None:
            # LOAS/LATM transport sniff: once a full first AudioSyncStream
            # frame (plus the next syncword) is buffered, switch to the
            # incremental LATM demuxer; while the buffer merely LOOKS like
            # LOAS (0x56 0xEx at the start), hold off the ADTS sniff so
            # 0xFFF patterns inside LATM payloads can't mis-latch it
            from aacjax.host.latm import probe_loas
            buf = bytes(self._buffer)
            if probe_loas(buf):
                self._transport = "loas"
                self._loas_buf = bytearray()
                self._loas_pos = 0
                self._loas_mux = None
                self._buffer.clear()
                self._feed_loas(buf)
                return
            if (len(buf) >= 2 and buf[0] == 0x56
                    and (buf[1] & 0xE0) == 0xE0):
                return  # probably LOAS, first frame still in flight
        if self.config is None:
            # Auto-configure from the first ADTS header, like the demuxer's
            # synthesized cookie (adts_demuxer.js:66-70) — a complete header
            # is enough, the frame body may still be in flight.
            from aacjax.host.bitio import BitReader, BitstreamUnderflow
            buf = bytes(self._buffer)
            for pos in range(0, max(len(buf) - 1, 0)):
                if buf[pos] == 0xFF and (buf[pos + 1] & 0xF6) == 0xF0:
                    try:
                        header = adts.read_header(BitReader(buf[pos:]))
                    except BitstreamUnderflow:
                        break  # header split across feeds; wait for more
                    except Exception:
                        continue
                    self.set_cookie(adts.synthesize_cookie(header))
                    self._bitpos = pos * 8
                    if header.num_frames > 1 and not header.protection_absent:
                        self._multi_rdb_crc = True
                    break

    def _feed_loas(self, data: bytes) -> None:
        """Incremental LOAS demux: complete AudioSyncStream frames yield
        raw_data_block payloads into the normal decode buffer; a partial
        trailing frame waits for the next feed."""
        from aacjax.host import latm
        from aacjax.host.bitio import BitReader
        self._loas_buf.extend(data)
        buf = self._loas_buf
        pos = self._loas_pos
        while pos + 3 <= len(buf):
            r = BitReader(bytes(buf[pos: pos + 3]))
            if r.read(11) != latm.LOAS_SYNC:
                pos += 1  # resync scan
                continue
            length = r.read(13)
            if pos + 3 + length > len(buf):
                break     # frame still in flight
            fr = BitReader(bytes(buf[pos + 3: pos + 3 + length]))
            try:
                self._loas_mux, payloads = latm.read_audio_mux_element(
                    fr, self._loas_mux)
            except Exception:  # noqa: BLE001 — scan past a corrupt frame
                pos += 1
                continue
            if self.config is None:
                self.set_cookie(self._loas_mux.asc_raw)
            for p in payloads:
                self._buffer.extend(p)
            self._reader = None
            pos += 3 + length
        # drop consumed prefix
        if pos > 4096:
            del self._loas_buf[:pos]
            pos = 0
        self._loas_pos = pos

    def reset(self) -> None:
        """Drop buffered data and decoder state (overlap, shape history);
        keeps the configuration.  Use when seeking to a new position."""
        self._buffer.clear()
        self._bitpos = 0
        self._reader = None
        self._adts_state = {}
        self._sbr_ctx = None
        self._sbr_procs = []
        self._ps_state = None
        self._sbr_mode = (True if (self.config is not None
                                   and self.config.sbr) else None)
        if self.config is not None:
            self._runtime = BatchDecoder([self.config], chunk_frames=1,
                                         cce_slots=self._cce_slots,
                                         use_native=self._use_native,
                                         drc_scale=self.drc_scale)

    @property
    def state(self) -> dict:
        """Serializable decoder state: buffer bit offset + runtime state
        (overlap buffers, window-shape history) — SURVEY.md §5."""
        rt = self._runtime.save_state() if self._runtime else None
        return {"bitpos": self._bitpos, "runtime": rt}

    # -- decoding -------------------------------------------------------------
    def read_chunk(self) -> np.ndarray | None:
        """Decode the next raw_data_block; returns interleaved float32 PCM
        of 1024*channels samples (1/32768 scale), or None until a complete
        block is buffered."""
        if self.config is None or self._runtime is None:
            if self._buffer:
                return None  # still waiting for a configuring ADTS header
            raise UnsupportedError("no configuration; call set_cookie or feed")
        if self._bitpos >= len(self._buffer) * 8:
            return None
        if self._bitpos // 8 >= 4096:
            # compact the consumed prefix
            drop = self._bitpos // 8
            del self._buffer[:drop]
            self._bitpos -= drop * 8
            self._reader = None
        if (self._runtime.use_native and self._bitpos % 8 == 0
                and self._sbr_mode is False and not self._multi_rdb_crc
                and not self._adts_state.get("block_crc")):
            # native streaming fast path (only once the stream is known to
            # carry no SBR: the C parser skips FIL extensions): parse ONE
            # block from the buffered tail; a miss (partial or corrupt
            # data) falls through to the python parser
            res = self._runtime.decode_block(
                bytes(self._buffer[self._bitpos // 8:]))
            if res is not None:
                pcm, consumed = res
                self._bitpos += consumed
                return self._runtime.stream_pcm(np.asarray(pcm), 0,
                                                1).reshape(-1)
        if self._reader is None:
            # one reader per feed (not per frame — the buffer is immutable
            # between feeds)
            self._reader = BitReader(bytes(self._buffer))
        self._reader.seek_bits(self._bitpos)
        st = self._runtime.streams[0]
        if self._sbr_ctx is None and self._sbr_mode is not False:
            from aacjax.host.sbr import SBRContext
            self._sbr_ctx = SBRContext(
                sample_rate=self.config.output_sample_rate if self.config.sbr
                else 2 * self.config.sample_rate)
        try:
            frame = decode_frame(self._reader, self.config, st.prev_shapes,
                                 sbr_ctx=self._sbr_ctx,
                                 drc_scale=self.drc_scale,
                                 adts_state=self._adts_state)
        except BitstreamUnderflow:
            return None  # need more data
        self._bitpos = self._reader.bit_position
        self._runtime._update_shapes(st, frame)
        st.frames_decoded += 1
        if self._sbr_mode is None:
            # implicit signaling resolves on the first decoded frame
            self._sbr_mode = any(
                getattr(e, "sbr", None) is not None for e in frame.elements)
        if self.config.profile == 4:
            # AAC-LTP: sequential time-feedback profile on the fp64
            # reference path (see decode_adts)
            if getattr(self, "_refdec", None) is None:
                from aacjax.host.refdec import ModelDecoder
                self._refdec = ModelDecoder(self.config)
            out = self._refdec.decode_frame(frame).astype(np.float32)
            return out.reshape(-1)
        pcm = self._runtime.step([[frame]])
        out = self._runtime.stream_pcm(pcm, 0, 1)
        if self._sbr_mode:
            out = self._apply_sbr(frame, out)
        return out.reshape(-1)

    @property
    def output_sample_rate(self) -> int:
        """PCM rate of read_chunk output (2x core when SBR is active)."""
        if self.config is None:
            raise UnsupportedError("no configuration")
        if self._sbr_mode:
            return (self.config.output_sample_rate if self.config.sbr
                    else 2 * self.config.sample_rate)
        return self.config.sample_rate

    def _apply_sbr(self, frame, pcm: np.ndarray) -> np.ndarray:
        """HE-AAC tail: 2x upsample every core channel, reconstructing the
        high band for elements that carried SBR payloads.  A mono stream
        whose SBR extension carries ps_data (HE-AAC v2) becomes stereo
        here: the adjusted QMF plane feeds the Parametric Stereo stage and
        two synthesis filterbanks."""
        from aacjax.host import sbr as sbrmod
        from aacjax.host.sbr_decode import (SBRChannelProc, _qmf_synthesis_np,
                                            process_channel,
                                            process_passthrough)
        from aacjax.host.syntax import CPEData
        outs = []
        ch_idx = 0
        for elem in frame.elements:
            nch = 2 if isinstance(elem, CPEData) else 1
            sf = getattr(elem, "sbr", None)
            eq = sbrmod.dequant(sf) if sf is not None else None
            ps = getattr(sf, "ps", None) if sf is not None else None
            if nch == 1 and sf is not None and (
                    ps is not None or self._ps_state is not None):
                while len(self._sbr_procs) <= ch_idx:
                    self._sbr_procs.append(SBRChannelProc())
                proc = self._sbr_procs[ch_idx]
                if self._ps_state is None:
                    from aacjax.host.ps_decode import PSProc
                    self._ps_state = (PSProc(),
                                      np.zeros_like(proc.v_hist))
                psproc, v_r = self._ps_state
                core = np.asarray(pcm[:, ch_idx], np.float64)
                X = process_channel(proc, core, sf, 0, eq[0], return_x=True)
                from aacjax.host.ps_decode import apply_ps
                xl, xr = apply_ps(psproc, X, ps)
                left, proc.v_hist = _qmf_synthesis_np(xl, proc.v_hist)
                right, v_r = _qmf_synthesis_np(xr, v_r)
                self._ps_state = (psproc, v_r)
                scale = np.float32(1.0 / 32768.0)
                outs.append(left.astype(np.float32) * scale)
                outs.append(right.astype(np.float32) * scale)
                ch_idx += 1
                continue
            for c in range(nch):
                while len(self._sbr_procs) <= ch_idx:
                    self._sbr_procs.append(SBRChannelProc())
                proc = self._sbr_procs[ch_idx]
                core = np.asarray(pcm[:, ch_idx], np.float64)
                if sf is not None:
                    out = process_channel(proc, core, sf, c, eq[c])
                else:
                    out = process_passthrough(proc, core)
                outs.append(out.astype(np.float32))
                ch_idx += 1
        return np.stack(outs, axis=1)

    @property
    def output_channels(self) -> int:
        """Channel count of read_chunk output (2 for a mono HE-AAC v2
        stream once ps_data has been seen)."""
        if self.config is None:
            raise UnsupportedError("no configuration")
        if self._ps_state is not None and self.config.channels == 1:
            return 2
        return self.config.channels


def _decode_raw_payloads(config: StreamConfig, asc_raw: bytes,
                         payloads: list[bytes], chunk_frames: int,
                         cce_slots: int, on_error: str
                         ) -> tuple[np.ndarray, int]:
    """Route demuxed raw_data_block payloads (one access unit each —
    LATM or MP4 samples) through the decode pipeline: configs that ADTS
    can express are re-framed onto the batched device path (incl. the
    HE-AAC/PS probing and profile routing of decode_adts); ER profiles
    run batched at their native frame length; everything else (960
    mode, explicit AOT-5 signaling, PCE-in-ASC) decodes on the
    streaming path with the embedded ASC as the cookie."""
    if (config.frame_length == 1024 and not config.sbr
            and 1 <= config.chan_config <= 7
            and config.profile in (1, 2, 4)):
        stream = b"".join(adts.wrap_frame(p, config) for p in payloads)
        return decode_adts(stream, chunk_frames=chunk_frames,
                           cce_slots=cce_slots, on_error=on_error)
    if config.profile in (17, 23, 39):
        # ER AAC-LC / AAC-LD / AAC-ELD (AOT 17/23/39 — profiles the
        # reference rejects outright): no cross-frame time feedback, so
        # the demuxed raw_data_blocks run through the batched device
        # pipeline at the profile's frame length (1024/960 or 512/480;
        # ELD synthesizes via the low-delay filterbank matmul)
        dec = BatchDecoder([config], chunk_frames=chunk_frames)
        out = []
        starts = range(0, len(payloads), chunk_frames)
        if dec.use_native:
            # pipelined: parse of chunk k+1 overlaps chunk k's device work
            sizes = [min(chunk_frames, len(payloads) - i) for i in starts]
            it = ([payloads[i:i + chunk_frames]] for i in starts)
            for k, pcm in enumerate(dec.decode_pipelined(it, out_int16=False,
                                                         compact=False)):
                if dec.streams[0].failed:
                    if on_error == "raise":
                        raise UnsupportedError(
                            f"stream failed: {dec.streams[0].last_error}")
                    dec.streams[0].failed = False
                out.append(dec.stream_pcm(pcm, 0, sizes[k]))
            return np.concatenate(out, axis=0), config.sample_rate
        for i in starts:
            group = payloads[i:i + chunk_frames]
            pcm = dec.step_raw([group], compact=False)
            if dec.streams[0].failed:
                if on_error == "raise":
                    raise UnsupportedError(
                        f"stream failed: {dec.streams[0].last_error}")
                dec.streams[0].failed = False  # concealed; keep decoding
            out.append(dec.stream_pcm(pcm, 0, len(group)))
        return np.concatenate(out, axis=0), config.sample_rate
    # general path: streaming decoder seeded with the embedded ASC
    dec = AACDecoder(cookie=asc_raw, cce_slots=max(cce_slots, 1))
    dec.feed(b"".join(payloads))
    chunks = []
    while True:
        try:
            chunk = dec.read_chunk()
        except Exception:  # noqa: BLE001 — concealment boundary
            if on_error == "raise":
                raise
            break  # raw payload stream: no container resync points left
        if chunk is None:
            break
        chunks.append(chunk.reshape(-1, dec.output_channels))
    if not chunks:
        raise UnsupportedError("no decodable raw_data_blocks")
    nch_out = max(c.shape[1] for c in chunks)
    if any(c.shape[1] != nch_out for c in chunks):
        chunks = [np.repeat(c, nch_out, axis=1) if c.shape[1] == 1 else c
                  for c in chunks]
    return np.concatenate(chunks, axis=0), dec.output_sample_rate


def decode_loas(data: bytes, chunk_frames: int = 64, cce_slots: int = 2,
                on_error: str = "raise") -> tuple[np.ndarray, int]:
    """Decode a LOAS/LATM byte stream (ISO/IEC 14496-3 §1.7.3 — the
    broadcast transport; the reference has no LATM demuxer at all).

    Demuxes the AudioMuxElements (aacjax.host.latm) and routes the
    raw_data_block payloads through _decode_raw_payloads."""
    from aacjax.host import latm
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error: {on_error}")
    mux, payloads = latm.split_loas(data, on_error=on_error)
    if mux is None or not payloads:
        raise UnsupportedError("no LOAS frames found")
    return _decode_raw_payloads(mux.config, mux.asc_raw, payloads,
                                chunk_frames, cce_slots, on_error)


def decode_m4a(data: bytes, chunk_frames: int = 64, cce_slots: int = 2,
               on_error: str = "raise", trim: bool = True
               ) -> tuple[np.ndarray, int]:
    """Decode an MP4/M4A file buffer (classic or fragmented layout).

    The reference registers for codec id 'mp4a' (decoder.js:30-31) but
    depends on the Aurora ecosystem's separate MP4 demuxer for the esds
    cookie and sample payloads; aacjax ships the demuxer
    (aacjax.host.mp4) so .m4a files decode end-to-end.

    trim=True applies the container's iTunes-style gapless metadata
    (edts/elst): the encoder-delay priming samples are dropped and the
    output is cut to the signaled valid duration, so the PCM lines up
    with the source material.  Returns (pcm [n, channels], rate).
    """
    from aacjax.host import mp4
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error: {on_error}")
    track, payloads = mp4.split_samples(data)
    if not payloads:
        raise UnsupportedError("MP4 track has no samples")
    pcm, rate = _decode_raw_payloads(track.config, track.asc_raw, payloads,
                                     chunk_frames, cce_slots, on_error)
    if trim and (track.priming or track.total_samples):
        # elst units are the media timescale (the core sample rate);
        # scale to output samples (2x when SBR is active)
        ts = track.timescale or track.config.sample_rate
        priming = round(track.priming * rate / ts)
        pcm = pcm[priming:]
        if track.total_samples:
            total = round(track.total_samples * rate / ts)
            pcm = pcm[:total]
    return pcm, rate


def decode_adts(data: bytes, chunk_frames: int = 64, cce_slots: int = 2,
                on_error: str = "raise", drc_scale: float = 0.0,
                verify_crc: bool = False) -> tuple[np.ndarray, int]:
    """Decode a whole ADTS byte stream through the batched device pipeline.

    Returns (pcm [total_samples, channels] float32 in 1/32768 scale,
    sample_rate).

    on_error: 'raise' aborts on the first malformed frame; 'skip' conceals
    undecodable frames as silence and continues from the next ADTS
    syncword (the reference offers neither — a bitstream error aborts its
    decode with no resync, SURVEY.md §5).

    cce_slots reserves channel slots per stream for coupling channels
    (cce.js); streams with more CCE elements per frame than slots raise a
    SlotOverflowError naming the fix.

    drc_scale in [0, 1] applies that fraction of any dynamic_range_info
    FIL payloads (0 = ignore, the default; DRC parsing lives on the
    python parse path, so a nonzero value trades the native parser for
    loudness processing).

    verify_crc=True checks each protected frame's 13818-7 §8.2.2
    crc_check (aacjax.host.adts.check_crc) before decoding; a mismatch
    raises BitstreamError (on_error='raise') or conceals the frame as
    silence (on_error='skip').  Default False: the reference skips the
    field (adts_demuxer.js:48-49), as does libavcodec — verification
    exceeds both.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error: {on_error}")
    frames = adts.split_frames(data)
    if not frames:
        raise UnsupportedError("no ADTS frames found")
    if verify_crc:
        checked = []
        for i, (h, s, e) in enumerate(frames):
            # split_frames strips the header from the payload range;
            # the CRC covers header bits too, so rewind to the syncword
            if adts.check_crc(data[s - h.header_bytes: e], h):
                checked.append((h, s, e))
            elif on_error == "raise":
                raise BitstreamError(f"ADTS frame {i}: crc_check mismatch")
            else:
                # empty slice -> parse error -> concealed as silence by
                # every downstream branch's per-frame error isolation
                checked.append((h, s, s))
        frames = checked
    header = frames[0][0]
    config = parse_asc(adts.synthesize_cookie(header))

    def _probe_sbr_ps() -> tuple[bool, bool]:
        """Implicitly signaled HE-AAC: probe the first frame for an SBR
        FIL extension and a ps_data payload (throwaway parse)."""
        from aacjax.host.sbr import SBRContext
        _, s, e = frames[0]
        try:
            f = decode_frame(BitReader(data[s:e]), config,
                             [0] * config.channels,
                             sbr_ctx=SBRContext(2 * config.sample_rate))
        except Exception:  # noqa: BLE001 — probe only
            return False, False
        sfs = [getattr(el, "sbr", None) for el in f.elements]
        return (any(sf is not None for sf in sfs),
                any(getattr(sf, "ps", None) is not None for sf in sfs))

    if config.profile == 4:
        # AAC-LTP: each frame's prediction reads the previous frames'
        # TIME output — an inherently sequential loop that would
        # serialize the batched pipeline; the rare profile decodes on
        # the fp64 reference path (aacjax.host.refdec).  The native
        # fast path parses in C and runs only the frame-serial math in
        # vectorized numpy (~25x the per-frame python loop below, which
        # stays as the error/concealment and no-native fallback).
        from aacjax.host.refdec import ModelDecoder, decode_ltp_native
        if drc_scale == 0.0:
            fast = decode_ltp_native([data[s:e] for _, s, e in frames],
                                     config)
            if fast is not None:
                return fast, config.sample_rate
        dec = ModelDecoder(config)
        prev_shapes = [0] * config.channels
        out = []
        for _, s, e in frames:
            try:
                frame = decode_frame(BitReader(data[s:e]), config,
                                     prev_shapes)
            except Exception:  # noqa: BLE001 — concealment boundary
                if on_error == "raise":
                    raise
                out.append(np.zeros((config.frame_length, config.channels),
                                    np.float32))
                continue
            ch = 0
            for el in frame.elements:
                infos = ([el.ics.info] if hasattr(el, "ics")
                         else [el.left.info, el.right.info])
                for info in infos:
                    if ch < len(prev_shapes):
                        prev_shapes[ch] = info.window_shape
                    ch += 1
            out.append(dec.decode_frame(frame).astype(np.float32))
        if not out:
            raise UnsupportedError("no decodable raw_data_blocks")
        return np.concatenate(out, axis=0), config.sample_rate

    has_sbr, has_ps = _probe_sbr_ps()
    multi_rdb = any(h.num_frames > 1 for h, _, _ in frames)
    if has_sbr and not multi_rdb:
        # HE-AAC v1/v2: batched device pipeline (core decode + device SBR
        # [+ Parametric Stereo] stages chained on device-resident PCM,
        # 2x output rate; PS doubles the channel count)
        dec = BatchDecoder([config], chunk_frames=chunk_frames,
                           cce_slots=max(cce_slots, 1) if has_ps
                           else cce_slots)
        payloads = [data[s:e] for _, s, e in frames]
        out = []
        nch = 2 if has_ps and config.channels == 1 else config.channels
        for i in range(0, len(payloads), chunk_frames):
            group = payloads[i:i + chunk_frames]
            pcm = dec.step_he_raw([group], compact=False)  # [C, T, 2F]
            if dec.streams[0].failed:
                if on_error == "raise":
                    raise UnsupportedError(
                        f"stream failed: {dec.streams[0].last_error}")
                dec.streams[0].failed = False  # concealed; keep decoding
            base = dec.streams[0].base_slot
            block = pcm[base: base + nch, : len(group), :]
            out.append(np.ascontiguousarray(
                block.reshape(nch, -1).T))
        return np.concatenate(out, axis=0), 2 * config.sample_rate

    if has_sbr:
        # multi-raw_data_block HE-AAC: streaming SBR path
        dec = AACDecoder(cookie=adts.synthesize_cookie(header),
                         cce_slots=max(cce_slots, 1))
        dec.feed(data)
        chunks = []
        while True:
            try:
                chunk = dec.read_chunk()
            except Exception:  # noqa: BLE001 — concealment boundary
                if on_error == "raise":
                    raise
                rest = adts.split_frames(bytes(dec._buffer),
                                         start=dec._bitpos // 8 + 1,
                                         resync_overruns=True)
                chunks.append(np.zeros((2 * config.frame_length,
                                        dec.output_channels), np.float32))
                if not rest:
                    break
                dec._bitpos = rest[0][1] * 8
                continue
            if chunk is None:
                break
            chunks.append(chunk.reshape(-1, dec.output_channels))
        if not chunks:
            raise UnsupportedError("no decodable raw_data_blocks")
        # HE-AAC v2: ps_data may first appear mid-stream; upmix any
        # earlier mono chunks so the output width is uniform
        nch_out = max(c.shape[1] for c in chunks)
        if any(c.shape[1] != nch_out for c in chunks):
            chunks = [np.repeat(c, nch_out, axis=1) if c.shape[1] == 1
                      else c for c in chunks]
        return np.concatenate(chunks, axis=0), dec.output_sample_rate

    if any(h.num_frames > 1 for h, _, _ in frames):
        # rare: multiple raw_data_blocks per ADTS frame — block boundaries
        # are only discoverable by parsing, so use the continuous-bitstream
        # streaming decoder for the whole file
        dec = AACDecoder(cookie=adts.synthesize_cookie(header),
                         cce_slots=max(cce_slots, 1), drc_scale=drc_scale)
        if any(h.num_frames > 1 and not h.protection_absent
               for h, _, _ in frames):
            # protected multi-rdb layout (per-block trailing crc_check):
            # the python parser skips the CRC words statefully
            dec._multi_rdb_crc = True
        if verify_crc and any(s == e for _, s, e in frames):
            # CRC-failed frames (emptied by the verify pass above) are
            # excised from the fed stream and concealed as silence —
            # one frame_length block per raw_data_block they carried
            chunks = []
            for h, s, e in frames:
                if s == e:
                    chunks.extend(
                        np.zeros((config.frame_length, config.channels),
                                 np.float32)
                        for _ in range(h.num_frames))
                    continue
                dec.feed(data[s - h.header_bytes: e])
                while True:
                    chunk = dec.read_chunk()
                    if chunk is None:
                        break
                    chunks.append(chunk.reshape(-1, config.channels))
            if not chunks:
                raise UnsupportedError("no decodable raw_data_blocks")
            return np.concatenate(chunks, axis=0), config.sample_rate
        dec.feed(data)
        chunks = []
        while True:
            try:
                chunk = dec.read_chunk()
            except Exception:  # noqa: BLE001 — concealment boundary
                if on_error == "raise":
                    raise
                # conceal the corrupt block as silence and resync to the
                # next ADTS frame boundary after the current position
                rest = adts.split_frames(bytes(dec._buffer),
                                         start=dec._bitpos // 8 + 1,
                                         resync_overruns=True)
                chunks.append(np.zeros((config.frame_length,
                                        config.channels), np.float32))
                if not rest:
                    break
                dec._bitpos = rest[0][1] * 8
                continue
            if chunk is None:
                break
            chunks.append(chunk.reshape(-1, config.channels))
        if not chunks:
            raise UnsupportedError("no decodable raw_data_blocks")
        return np.concatenate(chunks, axis=0), config.sample_rate
    dec = BatchDecoder([config], chunk_frames=chunk_frames,
                       cce_slots=cce_slots, drc_scale=drc_scale)
    payloads = [data[s:e] for _, s, e in frames]
    out = []
    starts = range(0, len(payloads), chunk_frames)
    if dec.use_native:
        # pipelined: the host parses chunk k+1 while the link/device work
        # on chunk k (measured +60% end-to-end on a link-bound host)
        from aacjax.host import native as native_mod
        sizes = [min(chunk_frames, len(payloads) - i) for i in starts]
        it = ([payloads[i:i + chunk_frames]] for i in starts)
        delegated = False
        for k, pcm in enumerate(dec.decode_pipelined(it, out_int16=False,
                                                     compact=False)):
            if dec.streams[0].failed:
                codes = getattr(dec, "_last_status", ())
                if any(int(c) == native_mod.ERR_DELEGATE for c in codes):
                    # legal content the native fast path delegates
                    # (Main + intensity, prediction + coupling): restart
                    # the whole single-stream decode on the python path
                    delegated = True
                    break
                if on_error == "raise":
                    raise UnsupportedError(
                        f"stream failed: {dec.streams[0].last_error}")
                dec.streams[0].failed = False  # concealed; keep decoding
            out.append(dec.stream_pcm(pcm, 0, sizes[k]))
        if not delegated:
            return np.concatenate(out, axis=0), config.sample_rate
        out = []
        dec = BatchDecoder([config], chunk_frames=chunk_frames,
                           cce_slots=cce_slots, drc_scale=drc_scale,
                           use_native=False)
    for i in starts:
        group = payloads[i:i + chunk_frames]
        pcm = dec.step_raw([group], compact=False)
        if dec.streams[0].failed:
            if on_error == "raise":
                raise UnsupportedError(
                    f"stream failed: {dec.streams[0].last_error}")
            dec.streams[0].failed = False  # concealed; keep decoding
        out.append(dec.stream_pcm(pcm, 0, len(group)))
    return np.concatenate(out, axis=0), config.sample_rate
