"""Batched multi-stream decode runtime.

Owns the per-stream decoder state (the complete resumable state of an
AAC-LC decoder, SURVEY.md §5 "checkpoint/resume": per-channel 1024-sample
overlap buffer — kept device-resident in HBM between steps — plus the
per-channel previous window shape consumed at parse time) and drives the
host-parse -> pack -> device-step loop.

One BatchDecoder serves any number of concurrent streams; every step
decodes up to T frames for every stream in a single jitted device program.
A malformed stream raises at parse time and is isolated by the caller
(per-stream try/except) — its slots simply go unfilled that step, and
other streams are unaffected (per-stream error isolation, SURVEY.md §5).
"""
from __future__ import annotations

import concurrent.futures
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.host import native
from aacjax.host.asc import StreamConfig
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import CPEData, Frame, SCEData, decode_frame
from aacjax.kernels.pipeline import PipelineFlags, jitted_decode_step
from aacjax.runtime.pack import pack_frames

FRAME = 1024
MAX_PAIRS_PER_STREAM = 4


@dataclass
class StreamState:
    """Host-side per-stream state (device state lives in BatchDecoder.overlap)."""
    config: StreamConfig
    base_slot: int
    n_slots: int               # channels + cce_slots
    prev_shapes: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    frames_decoded: int = 0
    failed: bool = False
    last_error: str = ""

    def __post_init__(self):
        if not isinstance(self.prev_shapes, np.ndarray) or not len(self.prev_shapes):
            self.prev_shapes = np.zeros(self.n_slots, np.int32)


class BatchDecoder:
    """Decodes T-frame chunks for a fixed set of concurrent streams."""

    def __init__(self, configs: list[StreamConfig], chunk_frames: int = 16,
                 cce_slots: int = 0, use_native: bool | None = None,
                 parse_workers: int | None = None):
        self.T = chunk_frames
        self.streams: list[StreamState] = []
        c = 0
        for cfg in configs:
            n = cfg.channels + cce_slots
            self.streams.append(StreamState(cfg, base_slot=c, n_slots=n))
            c += n
        self.C = c
        self.overlap = jnp.zeros((c, FRAME), jnp.float32)
        self.use_native = (native.available() if use_native is None
                           else use_native)
        self._parse_workers = parse_workers or min(os.cpu_count() or 1, 16)
        self._pool = None
        self._buffers: dict[str, np.ndarray] | None = None

    # -- host parse ---------------------------------------------------------
    def parse_stream_frames(self, stream_idx: int,
                            payloads: list[bytes]) -> list[Frame]:
        """Parse raw_data_block payloads for one stream, threading the
        previous-window-shape state per channel."""
        st = self.streams[stream_idx]
        frames = []
        for payload in payloads:
            reader = BitReader(payload)
            frame = decode_frame(reader, st.config, st.prev_shapes)
            self._update_shapes(st, frame)
            st.frames_decoded += 1
            frames.append(frame)
        return frames

    @staticmethod
    def _update_shapes(st: StreamState, frame: Frame) -> None:
        ch = 0
        for elem in frame.elements:
            if isinstance(elem, SCEData):
                st.prev_shapes[ch] = elem.ics.info.window_shape
                ch += 1
            elif isinstance(elem, CPEData):
                st.prev_shapes[ch] = elem.left.info.window_shape
                st.prev_shapes[ch + 1] = elem.right.info.window_shape
                ch += 2

    # -- device step --------------------------------------------------------
    def step(self, frames_per_stream: list[list[Frame] | None]
             ) -> np.ndarray:
        """Run one chunk: frames_per_stream[i] is up to T parsed frames for
        stream i (None or empty to skip).  Returns pcm [C, T, 1024] float32
        in the reference's 1/32768 scale; use stream_pcm() to slice."""
        per_slot = []
        for st, frames in zip(self.streams, frames_per_stream):
            if frames:
                if len(frames) > self.T:
                    raise ValueError(f"{len(frames)} frames > chunk size {self.T}")
                per_slot.append((st.base_slot, frames))
        batch, flags = pack_frames(per_slot, self.C, self.T)
        step_fn = jitted_decode_step(flags)
        pcm, self.overlap = step_fn(batch, self.overlap)
        return np.asarray(pcm)

    def stream_pcm(self, pcm: np.ndarray, stream_idx: int,
                   n_frames: int) -> np.ndarray:
        """Interleaved [n_frames*1024, channels] PCM for one stream."""
        st = self.streams[stream_idx]
        nch = st.config.channels
        block = pcm[st.base_slot:st.base_slot + nch, :n_frames, :]
        # [ch, T, 1024] -> [T*1024, ch]
        return np.ascontiguousarray(
            block.reshape(nch, n_frames * FRAME).T)

    # -- native raw-bytes fast path ------------------------------------------
    def _ensure_buffers(self) -> dict[str, np.ndarray]:
        if self._buffers is None:
            C, T = self.C, self.T
            n_streams = len(self.streams)
            P = n_streams * MAX_PAIRS_PER_STREAM
            self._buffers = dict(
                quant=np.zeros((C, T, FRAME), np.int32),
                scale=np.zeros((C, T, FRAME), np.float32),
                noise=np.zeros((C, T, FRAME), np.float32),
                meta=np.zeros((C, T, 6), np.int32),
                tns_lpc=np.zeros((C, T, 2, 8, 20), np.float32),
                tns_range=np.zeros((C, T, 2, 8, 2), np.int32),
                ms_mask=np.zeros((P, T, FRAME), np.float32),
                is_scale=np.zeros((P, T, FRAME), np.float32),
                pair_slots=np.zeros((P, 2), np.int32),
                flags=np.zeros((n_streams, 4), np.int32),
            )
        return self._buffers

    def _stream_views(self, i: int) -> native.ChunkArrays:
        b = self._ensure_buffers()
        st = self.streams[i]
        lo, hi = st.base_slot, st.base_slot + st.n_slots
        plo = i * MAX_PAIRS_PER_STREAM
        phi = plo + MAX_PAIRS_PER_STREAM
        return native.ChunkArrays(
            st.n_slots, self.T, MAX_PAIRS_PER_STREAM,
            views=dict(
                quant=b['quant'][lo:hi], scale=b['scale'][lo:hi],
                noise=b['noise'][lo:hi], meta=b['meta'][lo:hi],
                tns_lpc=b['tns_lpc'][lo:hi], tns_range=b['tns_range'][lo:hi],
                ms_mask=b['ms_mask'][plo:phi], is_scale=b['is_scale'][plo:phi],
                pair_slots=b['pair_slots'][plo:phi], flags=b['flags'][i]))

    def step_raw(self, payloads_per_stream: list[list[bytes] | None],
                 out_int16: bool = False) -> np.ndarray:
        """Decode one chunk directly from raw_data_block payload bytes.

        Uses the native C++ parser when built (parallel across streams,
        GIL released); falls back to the Python parse+pack path for the
        whole chunk when a stream needs features the native path defers
        (CCE).  Per-stream bitstream errors are isolated: the failing
        stream's remaining frames are dropped and marked failed, other
        streams are unaffected.
        """
        if not self.use_native:
            return self._step_python_raw(payloads_per_stream)
        self._out_int16 = out_int16

        b = self._ensure_buffers()
        for a in b.values():
            a.fill(0)
        shape_snapshots = [st.prev_shapes.copy() for st in self.streams]

        def parse_one(i: int):
            payloads = payloads_per_stream[i]
            if not payloads:
                return None
            st = self.streams[i]
            out = self._stream_views(i)
            info = native.parse_chunk(
                payloads, st.config.sample_index, st.config.chan_config,
                st.prev_shapes, out)
            st.frames_decoded += len(payloads)
            return info

        if self._pool is None:
            self._pool = concurrent.futures.ThreadPoolExecutor(
                self._parse_workers)
        futures = {i: self._pool.submit(parse_one, i)
                   for i in range(len(self.streams))
                   if payloads_per_stream[i]}
        fallback = False
        for i, fut in futures.items():
            try:
                fut.result()
            except native.NeedsPythonFallback:
                fallback = True
            except native.NativeParseError as e:
                st = self.streams[i]
                st.failed = True
                st.last_error = str(e)
                # frames before e.frame already landed in the buffers and
                # their meta valid-flags are set; later ones stay zero.
        if fallback:
            for st, snap in zip(self.streams, shape_snapshots):
                st.prev_shapes[:] = snap
            for a in b.values():
                a.fill(0)
            return self._step_python_raw(payloads_per_stream)
        return self._run_native_step(b)

    def _run_native_step(self, b: dict[str, np.ndarray]) -> np.ndarray:
        meta = b['meta']
        valid = meta[:, :, 5] != 0                      # [C,T]
        any_valid = valid.any(axis=1)
        last_valid = np.where(
            any_valid,
            (self.T - 1) - np.argmax(valid[:, ::-1], axis=1),
            -1).astype(np.int32)

        # compact pair lists (slots with registered pairs)
        used = (b['pair_slots'][:, 0] != 0) | (b['pair_slots'][:, 1] != 0)
        # pair (0,1) of stream 0 has slots (0,1) -> not detectable by != 0;
        # use the per-stream pair counts from flags instead
        idxs = []
        for i, st in enumerate(self.streams):
            n_pairs = int(b['flags'][i][0])
            for p in range(n_pairs):
                idxs.append(i * MAX_PAIRS_PER_STREAM + p)
        del used
        if idxs:
            sel = np.asarray(idxs, np.int64)
            bases = np.asarray(
                [self.streams[i // MAX_PAIRS_PER_STREAM].base_slot
                 for i in idxs], np.int32)
            pair_l = b['pair_slots'][sel, 0] + bases
            pair_r = b['pair_slots'][sel, 1] + bases
            ms_mask = b['ms_mask'][sel]
            is_scale = b['is_scale'][sel]
        else:
            pair_l = np.zeros(1, np.int32)
            pair_r = np.zeros(1, np.int32)
            ms_mask = np.zeros((1, self.T, FRAME), np.float32)
            is_scale = np.zeros((1, self.T, FRAME), np.float32)

        has_tns = bool(b['flags'][:, 1].any())
        batch = dict(
            quant=b['quant'], scale=b['scale'], noise=b['noise'],
            f_idx=np.ascontiguousarray(meta[:, :, 0]),
            s_idx=np.ascontiguousarray(meta[:, :, 1]),
            shape_idx=np.ascontiguousarray(meta[:, :, 2]),
            prev_shape_idx=np.ascontiguousarray(meta[:, :, 3]),
            is_short=np.ascontiguousarray(meta[:, :, 4]).astype(bool),
            last_valid=last_valid,
            pair_l=pair_l.astype(np.int32), pair_r=pair_r.astype(np.int32),
            ms_mask=ms_mask, is_scale=is_scale,
        )
        if has_tns:
            batch.update(
                tns_fwd_lpc=np.ascontiguousarray(b['tns_lpc'][:, :, 0]),
                tns_rev_lpc=np.ascontiguousarray(b['tns_lpc'][:, :, 1]),
                tns_fwd_start=np.ascontiguousarray(b['tns_range'][:, :, 0, :, 0]),
                tns_fwd_end=np.ascontiguousarray(b['tns_range'][:, :, 0, :, 1]),
                tns_rev_start=np.ascontiguousarray(b['tns_range'][:, :, 1, :, 0]),
                tns_rev_end=np.ascontiguousarray(b['tns_range'][:, :, 1, :, 1]))
        flags = PipelineFlags(has_stereo=True, has_tns=has_tns, has_cce=False,
                              out_int16=getattr(self, '_out_int16', False))
        step_fn = jitted_decode_step(flags)
        pcm, self.overlap = step_fn(batch, self.overlap)
        return np.asarray(pcm)

    def _step_python_raw(self, payloads_per_stream) -> np.ndarray:
        frames_per_stream = []
        for i, payloads in enumerate(payloads_per_stream):
            if not payloads:
                frames_per_stream.append(None)
                continue
            try:
                frames_per_stream.append(
                    self.parse_stream_frames(i, payloads))
            except Exception as e:  # noqa: BLE001 — per-stream isolation
                st = self.streams[i]
                st.failed = True
                st.last_error = str(e)
                frames_per_stream.append(None)
        return self.step(frames_per_stream)

    # -- state save/restore (checkpoint/resume, SURVEY.md §5) ---------------
    def save_state(self) -> dict:
        return {
            'overlap': np.asarray(self.overlap),
            'prev_shapes': [list(st.prev_shapes) for st in self.streams],
            'frames_decoded': [st.frames_decoded for st in self.streams],
        }

    def restore_state(self, state: dict) -> None:
        self.overlap = jnp.asarray(state['overlap'])
        for st, shapes, n in zip(self.streams, state['prev_shapes'],
                                 state['frames_decoded']):
            st.prev_shapes = list(shapes)
            st.frames_decoded = n
