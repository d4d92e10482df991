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

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.host.asc import StreamConfig
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import CPEData, Frame, SCEData, decode_frame
from aacjax.kernels.pipeline import jitted_decode_step
from aacjax.runtime.pack import pack_frames

FRAME = 1024


@dataclass
class StreamState:
    """Host-side per-stream state (device state lives in BatchDecoder.overlap)."""
    config: StreamConfig
    base_slot: int
    n_slots: int               # channels + cce_slots
    prev_shapes: list[int] = field(default_factory=list)
    frames_decoded: int = 0
    failed: bool = False

    def __post_init__(self):
        if not self.prev_shapes:
            self.prev_shapes = [0] * self.n_slots


class BatchDecoder:
    """Decodes T-frame chunks for a fixed set of concurrent streams."""

    def __init__(self, configs: list[StreamConfig], chunk_frames: int = 16,
                 cce_slots: int = 0):
        self.T = chunk_frames
        self.streams: list[StreamState] = []
        c = 0
        for cfg in configs:
            n = cfg.channels + cce_slots
            self.streams.append(StreamState(cfg, base_slot=c, n_slots=n))
            c += n
        self.C = c
        self.overlap = jnp.zeros((c, FRAME), jnp.float32)

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
