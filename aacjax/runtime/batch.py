"""Batched multi-stream decode runtime.

Owns the per-stream decoder state (the complete resumable state of an
AAC-LC decoder, SURVEY.md §5 "checkpoint/resume": per-channel 1024-sample
overlap buffer — kept device-resident in HBM between steps — plus the
per-channel previous window shape consumed at parse time) and drives the
host-parse -> pack -> device-step loop.

One BatchDecoder serves any number of concurrent streams; every step
decodes up to T frames for every stream in a single jitted device program.
A malformed stream is isolated by per-stream parse status: its decoded
prefix stays valid, the stream is flagged failed, and other streams are
unaffected (per-stream error isolation, SURVEY.md §5).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.host import native
from aacjax.host.asc import StreamConfig
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import CPEData, Frame, SCEData, decode_frame
from aacjax.kernels.pipeline import (PipelineFlags, jitted_decode_spec_step,
                                     jitted_decode_step)
from aacjax.runtime.pack import pack_frames

FRAME = 1024


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
                 drc_scale: float = 0.0):
        self.T = chunk_frames
        # dynamic-range-control compression fraction (0 = off).  Both
        # parse paths honor it: the python parser folds gains into the
        # scalefactor vectors; the native parser records each frame's
        # dynamic_range_info FIL offset and _apply_native_drc folds the
        # gains into the dequantized spectra — no performance cliff
        self.drc_scale = drc_scale
        self.streams: list[StreamState] = []
        c = 0
        for cfg in configs:
            n = cfg.channels + cce_slots
            self.streams.append(StreamState(cfg, base_slot=c, n_slots=n))
            c += n
        self.C = c
        # frame length is a batch-wide constant (1024, or 960 in
        # frameLengthFlag mode; mixing would need two pipelines)
        frame_lens = {cfg.frame_length for cfg in configs} or {FRAME}
        if len(frame_lens) > 1:
            raise ValueError(
                f"streams mix frame lengths {sorted(frame_lens)}; "
                "use one BatchDecoder per frame length")
        self.F = frame_lens.pop()
        # AAC-ELD: the low-delay filterbank carries THREE pending output
        # segments per channel (pipeline.eld_synthesis)
        self._eld = any(cfg.profile == 39 for cfg in configs)
        if self._eld and not all(cfg.profile == 39 for cfg in configs):
            raise ValueError("cannot mix ELD and non-ELD streams in one "
                             "BatchDecoder")
        self.overlap = jnp.zeros(
            (c, 3 * self.F if self._eld else self.F), jnp.float32)
        # the native parser handles every frame length (1024/960/512/480)
        # and the standard + ER/LD/ELD syntaxes, incl. Main-profile
        # predictor side info (the prediction itself is a stateful device
        # stage, decode_spec_step).  An all-LTP batch routes step_raw to
        # the stream-VECTORIZED fp64 engine (host/ltp_batch.py: one
        # native parse per chunk, frame-serial loop, [R,...] row math —
        # LTP's time feedback serializes frames per stream, never the
        # fleet); mixed LTP batches keep the per-frame python path
        any_ltp = any(cfg.profile == 4 for cfg in configs)
        self._ltp_batch = None
        if (any_ltp and native.available()
                and all(cfg.profile == 4 and cfg.frame_length == 1024
                        for cfg in configs)):
            from aacjax.host.ltp_batch import LTPBatchDecoder
            self._ltp_batch = LTPBatchDecoder(configs)
        self._any_main = any(cfg.profile == 1 for cfg in configs)
        self.use_native = ((native.available()
                            and self.F in (1024, 960, 512, 480)
                            and not any_ltp)
                           if use_native is None else use_native)
        if self.use_native and self.F not in (1024, 960, 512, 480):
            raise ValueError(f"native parser: unsupported frame length "
                             f"{self.F}")
        # one shared window-shape history; StreamStates view into it so the
        # native batch call can update everything in place
        self.prev_shapes = np.zeros(c, np.int32)
        for st in self.streams:
            st.prev_shapes = self.prev_shapes[
                st.base_slot:st.base_slot + st.n_slots]
        self._sample_indices = np.array(
            [st.config.sample_index for st in self.streams], np.int32)
        self._chan_configs = np.array(
            [st.config.chan_config for st in self.streams], np.int32)
        self._base_slots = np.array(
            [st.base_slot for st in self.streams], np.int32)
        self._n_slots = np.array(
            [st.n_slots for st in self.streams], np.int32)
        self._tables_pack = (native.stream_tables(configs)
                             if self.use_native else None)
        self._spec_buffers: list[native.SpecBatchArrays] | None = None
        # in-flight device steps awaiting finalize_step (timing completion)
        self._pending_steps: dict[int, tuple] = {}
        # serving: slot recycling while a pipelined generator is running
        # is deferred to the next chunk boundary (request_reset)
        self._pipeline_active = False
        self._deferred_resets: list[tuple[int, StreamConfig | None]] = []
        self._last_status = np.zeros(len(self.streams), np.int32)
        self._last_consumed = np.zeros(1, np.int64)
        from aacjax.runtime.stats import DecodeStats
        self.stats = DecodeStats(
            sample_rate=configs[0].sample_rate if configs else 44100)

    # -- host parse ---------------------------------------------------------
    def parse_stream_frames(self, stream_idx: int,
                            payloads: list[bytes]) -> list[Frame]:
        """Parse raw_data_block payloads for one stream, threading the
        previous-window-shape state per channel."""
        st = self.streams[stream_idx]
        frames = []
        for payload in payloads:
            reader = BitReader(payload)
            frame = decode_frame(reader, st.config, st.prev_shapes,
                                 drc_scale=self.drc_scale)
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
        limits = []
        for st, frames in zip(self.streams, frames_per_stream):
            if frames:
                if len(frames) > self.T:
                    raise ValueError(f"{len(frames)} frames > chunk size {self.T}")
                per_slot.append((st.base_slot, frames))
                limits.append(st.n_slots)
        batch, flags = pack_frames(per_slot, self.C, self.T, limits,
                                   frame_len=self.F, eld=self._eld)
        step_fn = jitted_decode_step(flags)
        if flags.has_pred:
            # Main profile: cross-frame predictor state rides the step
            from aacjax.kernels.pipeline import pred_state_init
            if getattr(self, '_pred_state', None) is None:
                self._pred_state = pred_state_init(self.C)
            pcm, self.overlap, self._pred_state = step_fn(
                batch, self.overlap, self._pred_state)
        else:
            pcm, self.overlap = step_fn(batch, self.overlap)
        return np.asarray(pcm)

    def stream_pcm(self, pcm: np.ndarray, stream_idx: int,
                   n_frames: int) -> np.ndarray:
        """Interleaved [n_frames*1024, channels] PCM for one stream."""
        st = self.streams[stream_idx]
        nch = st.config.channels
        block = pcm[st.base_slot:st.base_slot + nch, :n_frames, :]
        # [ch, T, F] -> [T*F, ch]
        return np.ascontiguousarray(
            block.reshape(nch, n_frames * self.F).T)

    # -- native raw-bytes fast path ------------------------------------------
    def step_raw(self, payloads_per_stream: list[list[bytes] | None],
                 out_int16: bool = False, materialize: bool = True,
                 use_pallas: bool | None = None,
                 compact: bool | None = None):
        """Decode one chunk directly from raw_data_block payload bytes.

        Native path: ONE C call parses every stream — including coupling
        (CCE) elements: dequant + PNS + M/S + intensity + dependent
        coupling fuse on host into final f32 spectra
        (native/aacparse.cc), and AFTER_TNS-onto-TNS'd-targets / time-
        domain coupling ride as device FMA entries — then one jitted
        device program runs TNS + coupling + IMDCT + overlap-add.

        Per-stream bitstream errors are isolated and concealed: the
        corrupt frame plays as silence, the rest of the stream's frames
        still decode, the stream is marked failed, and other streams are
        unaffected.

        materialize=False returns the device array without blocking so
        callers can overlap the next chunk's host parse with this chunk's
        device work and D2H.

        compact=True transfers spectra as per-row int16 fixed point (half
        the H2D bytes, ~1.5e-5 relative error — below the codec's own
        quantization noise); the default f32 transfer is bit-exact.
        """
        if self._ltp_batch is not None:
            # all-LTP batch: stream-vectorized fp64 engine (one native
            # parse per chunk; see host/ltp_batch.py).  The carried
            # state lives in the engine; the decoder's own overlap is
            # unused on this route.
            pcm = self._ltp_batch.step_raw(payloads_per_stream)
            for st, n in zip(self.streams,
                             (len(p or []) for p in payloads_per_stream)):
                st.frames_decoded += n
            if out_int16:
                pcm = np.clip(np.round(pcm * 32768.0),
                              -32768, 32767).astype(np.int16)
            return pcm
        if not self.use_native:
            return self._step_python_raw(payloads_per_stream)
        prev_snap = self.prev_shapes.copy()
        fd_snap = [st.frames_decoded for st in self.streams]
        parsed = self._parse_native(payloads_per_stream, compact=compact)
        if any(int(c) == native.ERR_DELEGATE for c in self._last_status):
            # a stream carries legal content the native spec path cannot
            # order correctly (Main-profile + intensity, prediction +
            # coupling): redo the WHOLE chunk on the python packer path —
            # correctness beats the fast path for these rare
            # combinations.  Window-shape history and frame counts roll
            # back first (the native call advanced them in place).
            self.prev_shapes[:] = prev_snap
            for st, fd, code in zip(self.streams, fd_snap,
                                    self._last_status):
                st.frames_decoded = fd
                if int(code) == native.ERR_DELEGATE:
                    st.failed = False
                    st.last_error = None
            return self._step_python_raw(payloads_per_stream)
        pcm = self._device_step(parsed, out_int16=out_int16,
                                use_pallas=use_pallas)
        return self.finalize_step(pcm) if materialize else pcm

    # -- HE-AAC (SBR) batched path -------------------------------------------
    def _sbr_init(self) -> None:
        from aacjax.host import sbr as sbrmod
        from aacjax.host import sbr_pack as SP
        from aacjax.kernels.sbr_batch import sbr_state_init
        if not hasattr(self, '_sbr_ctxs'):
            self._sbr_ctxs = [
                sbrmod.SBRContext(sample_rate=2 * st.config.sample_rate)
                for st in self.streams]
            self._sbr_host_states = [SP.SBRHostState()
                                     for _ in range(self.C)]
            self._sbr_np_procs = [None] * self.C
            # slots routed permanently to the numpy SBR path (deviant
            # header or VAR envelope overhang): their cross-frame DSP
            # state lives in the numpy proc, so they must not bounce
            # back to the batched kernel's (now stale) device state
            self._sbr_np_sticky = [False] * self.C
            self._sbr_dev_state = sbr_state_init(self.C)
            # Per-SLOT header config: each slot's table-derived statics
            # (kx / patch map / limiter grid) are rendered into dense
            # per-slot planes the ONE compiled SBR program reads —
            # heterogeneous-header fleets run on the device path with no
            # recompiles and no numpy exile (VERDICT r4 #1).  _slot_sbr_key
            # tracks the (header, id(tables)) rendered in each row;
            # _sbr_cfg_dev caches the device copy until a row changes.
            from aacjax.kernels.sbr_batch import cfg_planes_zeros
            self._sbr_cfg_planes = cfg_planes_zeros(self.C)
            self._slot_sbr_key = [None] * self.C
            self._slot_sbr_hdr = [None] * self.C
            self._sbr_cfg_dev = None
            self._sbr_cfg_mesh = None
            # slots _readopt_sticky could not re-adopt (genuinely mixed
            # headers/modes): the pipelined path skips draining for them
            self._readopt_blocked: set[int] = set()
            # cache for context-free (all-delta-freq) SBR payloads, shared
            # across streams: serving fleets repeat identical payloads
            self._sbr_parse_cache: dict = {}
            # Parametric Stereo (HE-AAC v2) batched stage
            from aacjax.host import ps_pack as PP
            self._ps_enabled = False
            # per-slot PS band mode (None until the slot's first
            # ps_data); 20- and 34-band slots mix freely — homogeneous
            # batches run the single-mode program, mixed batches the
            # dual program (kernels.ps_batch.sbr_ps_apply_dual)
            self._ps_slot_is34: list = [None] * self.C
            self._ps_dense = None
            self._ps_pack_states = [PP.PSPackState() for _ in range(self.C)]
            self._ps_pair = [-1] * self.C   # R-output slot per PS source
            # device PS state per band mode (lazily created per mode),
            # freshness flags (a set that sat out a chunk while the
            # other mode ran is stale and re-seeds before reuse), and
            # pending re-adoption row seeds applied at _ps_mode_begin
            self._ps_dev_states: dict = {False: None, True: None}
            self._ps_fresh: dict = {False: False, True: False}
            self._ps_row_seeds: dict = {False: {}, True: {}}
            self._ps_np: list = [None] * self.C  # sticky (PSProc, vl, vr)

    def _ps_engage(self, slot: int) -> None:
        """First ps_data on `slot`: allocate the chunk's PS dense arrays,
        assign the stereo pair slot, and flip the chunk to the combined
        SBR+PS program."""
        from aacjax.host import ps_pack as PP
        from aacjax.runtime.pack import SlotOverflowError
        if self._ps_pair[slot] < 0:
            st = next(s for s in self.streams
                      if s.base_slot <= slot < s.base_slot + s.n_slots)
            pair = slot + 1
            if pair >= st.base_slot + st.n_slots:
                raise SlotOverflowError(
                    "HE-AAC v2 (Parametric Stereo) emits 2 channels from a "
                    "mono stream and needs a spare slot; raise cce_slots "
                    "(BatchDecoder/decode_adts) to at least 1")
            self._ps_pair[slot] = pair
        if self._ps_dense is None:
            self._ps_dense = PP.alloc_ps_dense(self.C, self.T)
        self._ps_enabled = True

    def _ps_mode_begin(self, modes: list, prev_state: dict) -> None:
        """Ensure a device PS state set exists and is FRESH for every
        band mode running this chunk, then apply any pending re-adoption
        row seeds.  Mode-independent planes (the dual QMF synthesis
        histories and hybrid FIR history) seed from whichever set is
        fresh — the running program owned the synthesis of EVERY slot,
        PS or not — or from the mono path's v_hist before any PS program
        ran.  A set that sat frozen while only the other mode ran
        re-seeds those planes the same way (mode-dependent planes zero;
        slots of the returning mode overlay their own exact rows from
        the sticky re-adoption seeds)."""
        from aacjax.kernels.ps_batch import ps_state_init
        indep = ("v_l", "v_r", "hist4_r", "hist4_i")
        for m in modes:
            other = self._ps_dev_states[not m]
            src = other if self._ps_fresh[not m] else None
            st0 = self._ps_dev_states[m]
            if st0 is None:
                st0 = ps_state_init(self.C, m)
                if src is not None:
                    for k in indep:
                        # fresh buffers: both sets are donated together
                        st0[k] = jnp.array(src[k])
                else:
                    # PS owns the L synthesis from here: continue the
                    # mono path's filterbank state seamlessly
                    st0["v_l"] = prev_state["v_hist"].copy()
            elif not self._ps_fresh[m]:
                for k in list(st0):
                    st0[k] = (jnp.array(src[k])
                              if src is not None and k in indep
                              else jnp.zeros_like(st0[k]))
            for s, rows in self._ps_row_seeds[m].items():
                for k, row in rows.items():
                    st0[k] = st0[k].at[s].set(
                        jnp.asarray(row, st0[k].dtype))
            self._ps_row_seeds[m] = {}
            self._ps_dev_states[m] = st0
            self._ps_fresh[m] = True
        for m in (False, True):
            if m not in modes:
                self._ps_fresh[m] = False

    def _sbr_chunk_begin(self, payloads_per_stream) -> None:
        """Per-chunk bookkeeping for the numpy fallback: frame counts per
        slot, the per-slot SBR records for possible replay, and a
        snapshot of the host sequential state (a slot that turns sticky
        mid-chunk replays its whole chunk from the pre-chunk state)."""
        from aacjax.host.sbr_pack import SBRHostState
        self._chunk_nframes = [0] * self.C
        for st, payloads in zip(self.streams, payloads_per_stream):
            n = len(payloads or [])
            for s in range(st.base_slot, st.base_slot + st.n_slots):
                self._chunk_nframes[s] = n
        self._chunk_sbr_records: list[list] = [[] for _ in range(self.C)]
        # slots that already packed an SBR frame THIS chunk: their cfg
        # row is frozen for the chunk (a mid-chunk header change replays
        # the chunk on numpy, then re-adopts at the boundary)
        self._sbr_packed_chunk = [False] * self.C
        if self._ps_dense is not None:
            from aacjax.host import ps_pack as PP
            self._ps_dense = PP.alloc_ps_dense(self.C, self.T)

        def clone(hs):
            return SBRHostState(
                bw=hs.bw.copy(),
                invf_prev=(None if hs.invf_prev is None
                           else hs.invf_prev.copy()),
                index_noise=hs.index_noise, index_sine=hs.index_sine,
                la_prev=hs.la_prev,
                s_index_prev=(None if hs.s_index_prev is None
                              else hs.s_index_prev.copy()),
                t_env_last=hs.t_env_last)

        self._host_state_snap = [
            None if self._sbr_np_sticky[s] else
            clone(self._sbr_host_states[s]) for s in range(self.C)]

        def clone_ps(pst):
            from aacjax.host.ps_pack import PSPackState
            return PSPackState(
                h_prev=pst.h_prev.copy(),
                ipd_hist=pst.ipd_hist.copy(), opd_hist=pst.opd_hist.copy(),
                ps_prev=pst.ps_prev, is34_prev=pst.is34_prev,
                h_slot_imag=pst.h_slot_imag.copy())

        self._ps_pack_snap = (
            None if not self._ps_enabled else
            [None if self._sbr_np_sticky[s] else
             clone_ps(self._ps_pack_states[s]) for s in range(self.C)])

    def _sbr_pack_payload(self, dense, sf, slot: int, nch: int,
                          t: int) -> None:
        """Pack one parsed SBRFrame into the dense arrays.  The slot's
        header statics live in its own cfg-plane row (per-slot data, not
        a compile key), so any mix of headers across the batch runs in
        the ONE compiled device program.  A header change lands on the
        device path immediately when the slot has not yet packed an SBR
        frame this chunk (the row just re-renders); a MID-chunk change
        replays that one chunk on the numpy path and re-adopts at the
        next boundary (_readopt_sticky).  A PS band-mode (20/34)
        mismatch with the chunk kernel likewise diverts to numpy until
        the mode election settles.  VAR-class envelope overhang runs
        on-device (the kernel's Y double-buffer)."""
        from aacjax.host import sbr as sbrmod
        from aacjax.host import sbr_pack as SP
        eq = sbrmod.dequant(sf)
        ps = getattr(sf, "ps", None) if nch == 1 else None
        key = (sf.header, id(sf.tables))
        for c in range(nch):
            s = slot + c
            self._chunk_sbr_records[s].append((t, sf, c, eq[c]))
            if self._slot_sbr_key[s] != key and not self._sbr_np_sticky[s]:
                if self._sbr_packed_chunk[s]:
                    # header changed mid-chunk: the chunk's cfg row is
                    # frozen, so this chunk replays on numpy; the next
                    # boundary re-renders the row and re-adopts
                    self._sbr_np_sticky[s] = True
                else:
                    self._set_cfg_row(s, sf.header, sf.tables)
            if not self._sbr_np_sticky[s]:
                SP.pack_channel_frame(dense, s, t,
                                      self._sbr_host_states[s],
                                      sf, c, eq[c])
                self._sbr_packed_chunk[s] = True
        if nch == 1 and (
                ps is not None
                or self._ps_pack_states[slot].ps_prev is not None):
            from aacjax.host import ps_pack as PP
            self._ps_engage(slot)
            if not self._sbr_np_sticky[slot]:
                if not PP.pack_ps_frame(self._ps_dense, slot, t,
                                        self._ps_pack_states[slot], ps):
                    # band-scheme SWITCH with carried state: the carry
                    # remap runs on the warm-seeded numpy path for this
                    # chunk, then re-adopts into the new mode's device
                    # state at the next boundary
                    self._sbr_np_sticky[slot] = True
                else:
                    self._ps_slot_is34[slot] = \
                        self._ps_pack_states[slot].is34_prev

    def _set_cfg_row(self, s: int, hdr, tbl) -> None:
        """Render slot `s`'s header statics into its cfg-plane row and
        invalidate the cached device copy."""
        from aacjax.host import sbr as sbrmod
        from aacjax.kernels.sbr_batch import SBRStaticConfig, set_cfg_row
        limgain = float(sbrmod._consts()["limgain"][hdr.limiter_gains])
        set_cfg_row(self._sbr_cfg_planes,
                    s, SBRStaticConfig.from_tables(tbl, limgain))
        self._slot_sbr_key[s] = (hdr, id(tbl))
        self._slot_sbr_hdr[s] = hdr
        self._sbr_cfg_dev = None

    def _cfg_planes_device(self, mesh=None):
        """The per-slot cfg planes on device (sharded P('stream') under a
        mesh), cached until a row changes — steady-state chunks pay zero
        cfg H2D (the planes are ~44 KB/slot and change only on header
        churn)."""
        if self._sbr_cfg_dev is None or self._sbr_cfg_mesh is not mesh:
            if mesh is not None:
                from aacjax.runtime import mesh as meshlib
                self._sbr_cfg_dev = jax.block_until_ready(
                    meshlib.shard_stream_tree(mesh, self._sbr_cfg_planes))
            else:
                self._sbr_cfg_dev = jax.block_until_ready(
                    jax.device_put(self._sbr_cfg_planes))
            self._sbr_cfg_mesh = mesh
        return self._sbr_cfg_dev

    def _he_ctx(self) -> dict:
        """Capture one chunk's SBR/PS bookkeeping into an explicit context
        so the device phase can run on a worker thread while the next
        chunk parses (the captured objects are re-created per chunk by
        _sbr_chunk_begin; the sticky set is frozen at capture time).
        Slots with no SBR payload seen yet keep their zeroed cfg row —
        a valid don't-care (has_sbr=0 routes them through the upsample
        branch)."""
        from aacjax.host import ps_pack as PP
        # live PS band modes this chunk (engaged, device-path slots):
        # one mode -> single-mode program, two -> the dual program
        ps_modes = sorted({bool(self._ps_slot_is34[s])
                           for s in range(self.C)
                           if self._ps_slot_is34[s] is not None
                           and not self._sbr_np_sticky[s]
                           and self._ps_pair[s] >= 0})
        return dict(
            nframes=self._chunk_nframes,
            records=self._chunk_sbr_records,
            host_snap=self._host_state_snap,
            ps_snap=self._ps_pack_snap,
            sticky=[s for s in range(self.C)
                    if self._sbr_np_sticky[s] and self._chunk_nframes[s]],
            ps_enabled=self._ps_enabled,
            ps_modes=ps_modes,
            ps_mask34=np.array([1.0 if self._ps_slot_is34[s] else 0.0
                                for s in range(self.C)], np.float32),
            ps_slot_modes=list(self._ps_slot_is34),
            ps_dense=self._ps_dense,
            ps_himag=(PP.himag_plane(self._ps_pack_states, self.C)
                      if self._ps_enabled else None),
            ps_pair=list(self._ps_pair))

    def _sbr_dispatch(self, core_pcm, dense, ctx: dict,
                      out_int16: bool = False, mesh=None, xfer_lock=None):
        """Dispatch half of the SBR stage: upload the dense SBR/PS planes
        (under `xfer_lock` when H2D and D2H must serialize, see
        _transfer_lock) and run the batched SBR / SBR+PS program on the
        device-resident core PCM.  Pre-materializes the per-slot filter
        states newly-sticky slots will need (the jitted step donates its
        state buffers).  Returns (device PCM, seeds) for _sbr_download.

        With `mesh` (a stream-only ('stream','frame') mesh, n_frame=1),
        the SBR / SBR+PS program runs jitted over the mesh with every
        slot-leading plane and state FIFO sharded P('stream') — pure data
        parallel, zero collectives (runtime.mesh module docs)."""
        import contextlib
        from aacjax.kernels.sbr_batch import jitted_sbr_apply
        if mesh is not None:
            from aacjax.runtime import mesh as meshlib
        lk = xfer_lock if xfer_lock is not None else contextlib.nullcontext()
        # host phase may have pre-compacted the dense planes (~3x fewer
        # H2D bytes; the jitted program expands them, fused for free)
        dense_dict = dense if isinstance(dense, dict) else vars(dense)
        sticky = ctx["sticky"]
        # materialize pre-chunk filter states for newly-sticky slots NOW:
        # the jitted step donates its state buffers.  This is a D2H, so
        # it takes the transfer lock like every other transfer here.
        # For PS slots the PS device state seeds the numpy PSProc warm
        # (synthesis histories, delay/allpass lines, transient trackers)
        # instead of the old cold start.
        prev_state = self._sbr_dev_state
        fresh = [s for s in sticky if self._sbr_np_procs[s] is None]
        with lk:
            seeds = {
                s: tuple(np.asarray(prev_state[k][s], np.float64)
                         for k in ("x_hist", "v_hist", "xlow_r", "xlow_i",
                                   "ytail_r", "ytail_i"))
                for s in fresh}
            if ctx["ps_enabled"]:
                for s in fresh:
                    m = ctx["ps_slot_modes"][s]
                    pdev = (self._ps_dev_states[bool(m)]
                            if m is not None else None)
                    if (ctx["ps_pair"][s] >= 0 and pdev is not None
                            and self._ps_np[s] is None):
                        seeds[("ps", s)] = {
                            k: np.asarray(pdev[k][s], np.float64)
                            for k in ("v_l", "v_r", "delay_r", "delay_i",
                                      "ap_r", "ap_i", "peak", "psmooth",
                                      "pdiff", "hist4_r", "hist4_i")}
        if ctx["ps_enabled"]:
            from aacjax.kernels.ps_batch import (jitted_sbr_ps_apply,
                                                 jitted_sbr_ps_apply_dual,
                                                 ps_state_init)
            modes = ctx["ps_modes"] or [False]
            self._ps_mode_begin(modes, prev_state)
            dual = len(modes) == 2
            from aacjax.host import ps_pack as PP
            out_src = np.arange(self.C, dtype=np.int32)
            out_role = np.zeros(self.C, np.int32)
            for s, p in enumerate(ctx["ps_pair"]):
                if p >= 0:
                    out_src[p] = s
                    out_role[p] = 1
            ps_dense = PP.dense_to_dict(ctx["ps_dense"], ctx["ps_himag"],
                                        out_src, out_role)
            if dual:
                ps_dense["slot_is34"] = ctx["ps_mask34"]
            if mesh is not None:
                fn = (meshlib.sharded_sbr_ps_apply_dual(
                          mesh, out_int16 and not sticky) if dual else
                      meshlib.sharded_sbr_ps_apply(
                          mesh, out_int16 and not sticky, modes[0]))
                with lk:
                    # block INSIDE the lock: device_put only enqueues, and
                    # the serialized-transfer contract needs the bytes on
                    # the wire before the lock releases
                    cfg_dev = self._cfg_planes_device(mesh)
                    dense_dict = jax.block_until_ready(
                        meshlib.shard_stream_tree(mesh, dense_dict))
                    ps_dense = jax.block_until_ready(
                        meshlib.shard_stream_tree(mesh, ps_dense))
                    prev_state = jax.block_until_ready(
                        meshlib.shard_stream_tree(mesh, prev_state))
                    for m in modes:
                        self._ps_dev_states[m] = jax.block_until_ready(
                            meshlib.shard_stream_tree(
                                mesh, self._ps_dev_states[m]))
            else:
                fn = (jitted_sbr_ps_apply_dual(out_int16 and not sticky)
                      if dual else
                      jitted_sbr_ps_apply(out_int16 and not sticky,
                                          modes[0]))
                with lk:
                    cfg_dev = self._cfg_planes_device()
                    dense_dict = jax.block_until_ready(
                        jax.device_put(dense_dict))
                    ps_dense = jax.block_until_ready(
                        jax.device_put(ps_dense))
            if dual:
                (pcm2, self._sbr_dev_state, self._ps_dev_states[False],
                 self._ps_dev_states[True]) = fn(
                    core_pcm, dense_dict, ps_dense, prev_state,
                    self._ps_dev_states[False], self._ps_dev_states[True],
                    cfg_dev)
            else:
                m = modes[0]
                pcm2, self._sbr_dev_state, self._ps_dev_states[m] = fn(
                    core_pcm, dense_dict, ps_dense, prev_state,
                    self._ps_dev_states[m], cfg_dev)
        else:
            if mesh is not None:
                fn = meshlib.sharded_sbr_apply(mesh,
                                               out_int16 and not sticky)
                with lk:
                    cfg_dev = self._cfg_planes_device(mesh)
                    dense_dict = jax.block_until_ready(
                        meshlib.shard_stream_tree(mesh, dense_dict))
                    prev_state = jax.block_until_ready(
                        meshlib.shard_stream_tree(mesh, prev_state))
            else:
                fn = jitted_sbr_apply(out_int16 and not sticky)
                with lk:
                    cfg_dev = self._cfg_planes_device()
                    dense_dict = jax.block_until_ready(
                        jax.device_put(dense_dict))
            pcm2, self._sbr_dev_state = fn(core_pcm, dense_dict,
                                           prev_state, cfg_dev)
        # re-home the pending stats record to the chained result
        pending = self._pending_steps.pop(id(core_pcm), None)
        if pending is not None:
            self._pending_steps[id(pcm2)] = pending
        return pcm2, seeds

    def _sbr_stage(self, core_pcm, dense, ctx: dict,
                   out_int16: bool = False, mesh=None) -> np.ndarray:
        """Run the batched device SBR program on device-resident core PCM
        and materialize (dispatch + download in one call — the pipelined
        path splits the two halves across its worker threads)."""
        pcm2, seeds = self._sbr_dispatch(core_pcm, dense, ctx, out_int16,
                                         mesh=mesh)
        return self._sbr_download(pcm2, seeds, ctx, core_pcm)

    def _sbr_download(self, pcm2, seeds: dict, ctx: dict,
                      core_pcm, xfer_lock=None) -> np.ndarray:
        """Download half of the SBR stage: materialize the device PCM and
        replay sticky slots (deviant header / PS band-mode mismatch) on
        the numpy path, seeded from the pre-chunk batched state so the
        switch is continuous.  Only the D2H transfers take `xfer_lock`;
        the (host CPU) sticky replay runs outside it so it never stalls
        the upload worker's H2D."""
        import contextlib
        from aacjax.host import sbr_decode as SD
        lk = xfer_lock if xfer_lock is not None else contextlib.nullcontext()
        sticky = ctx["sticky"]
        with lk:
            out = self.finalize_step(pcm2)
            core_np = np.asarray(core_pcm) if sticky else None
        if sticky:
            if not out.flags.writeable:
                out = np.array(out)  # device buffers are read-only views
            for slot in sticky:
                proc = self._sbr_np_procs[slot]
                if proc is None:
                    # transition: inherit the batched path's per-slot
                    # state (QMF/synthesis histories from the device
                    # dict, sequential counters from the host snapshot)
                    proc = SD.SBRChannelProc()
                    hs = ctx["host_snap"][slot]
                    if hs is not None:
                        proc.bw = np.asarray(hs.bw, np.float64).copy()
                        proc.invf_prev = (None if hs.invf_prev is None
                                          else np.array(hs.invf_prev))
                        proc.index_noise = hs.index_noise
                        proc.index_sine = hs.index_sine
                        proc.la_prev = hs.la_prev
                        proc.s_index_prev = (
                            None if hs.s_index_prev is None
                            else np.array(hs.s_index_prev))
                        proc.t_env_last = hs.t_env_last
                    x_hist, v_hist, xlr, xli, ytr, yti = seeds[slot]
                    proc.x_hist = x_hist
                    proc.v_hist = v_hist
                    proc.xlow_hist = xlr + 1j * xli
                    proc.y_tail = ytr + 1j * yti
                    self._sbr_np_procs[slot] = proc
                recs = {t: (sf, c, eq)
                        for (t, sf, c, eq) in ctx["records"][slot]}
                pair = ctx["ps_pair"][slot]
                for t in range(ctx["nframes"][slot]):
                    core = core_np[slot, t].astype(np.float64)
                    if t in recs:
                        sf, c, eq = recs[t]
                        if pair >= 0:
                            # PS stream (e.g. 34-band mode): full numpy
                            # stereo path, seeded WARM from the batched
                            # PS device state + pre-chunk pack snapshot
                            # (falls back to a cold start when no prior
                            # PS state exists)
                            from aacjax.host.ps_decode import apply_ps
                            if self._ps_np[slot] is None:
                                self._ps_np[slot] = self._seed_ps_np(
                                    slot, ctx, seeds, proc)
                            psproc, vl, vr = self._ps_np[slot]
                            X = SD.process_channel(proc, core, sf, 0,
                                                   eq, return_x=True)
                            xl, xr = apply_ps(psproc, X,
                                              getattr(sf, "ps", None))
                            pl, vl = SD._qmf_synthesis_np(xl, vl)
                            pr, vr = SD._qmf_synthesis_np(xr, vr)
                            self._ps_np[slot] = (psproc, vl, vr)
                            out[slot, t] = pl * (1.0 / 32768.0)
                            out[pair, t] = pr * (1.0 / 32768.0)
                        else:
                            out[slot, t] = SD.process_channel(proc, core,
                                                              sf, c, eq)
                    else:
                        out[slot, t] = SD.process_passthrough(proc, core)
                        if pair >= 0:
                            out[pair, t] = out[slot, t]
        return out

    def _seed_ps_np(self, slot: int, ctx: dict, seeds: dict, proc):
        """Build the sticky-transition numpy PS state (PSProc, v_l, v_r)
        for `slot`, WARM where prior batched PS state exists:

        - QMF synthesis histories from the PS device state (the cold
          start used the mono v_hist for L and SILENCE for R);
        - delay/allpass lines and transient trackers from the device
          state (apply_ps re-clears them itself if this frame switches
          band scheme, matching libavcodec);
        - the hybrid FIR input history from the SBR xlow seed (the PS
          line is the low 5 QMF bands of the same continuous signal);
        - H matrices copied from the pre-chunk pack snapshot's h_prev
          value mirror (the same values the device's knot-0 carry
          plane ships), plus the 6-bit phase histories and the ps_data
          replay reference."""
        from aacjax.host.ps_decode import PSProc
        p = PSProc()
        vl = np.array(proc.v_hist)
        vr = vl * 0.0
        dev = seeds.get(("ps", slot))
        if dev is not None:
            vl = dev["v_l"].copy()
            vr = dev["v_r"].copy()
            nb = dev["delay_r"].shape[0]
            p.delay[:nb] = dev["delay_r"] + 1j * dev["delay_i"]
            nap = dev["ap_r"].shape[0]
            p.ap_delay[:nap] = dev["ap_r"] + 1j * dev["ap_i"]
            npar = dev["peak"].shape[0]
            p.peak_decay_nrg[:npar] = dev["peak"]
            p.power_smooth[:npar] = dev["psmooth"]
            p.peak_decay_diff[:npar] = dev["pdiff"]
        sd = seeds.get(slot)
        if sd is not None and dev is not None:
            # the hybrid FIR history is X slots 26..31 of the last
            # frame: slots 26..29 live in the PS hist4 carry, 30..31 in
            # the SBR xlow line (whose 8 rows are X slots 30..37)
            xlr, xli = sd[2], sd[3]
            for i in range(5):
                p.in_hist[i] = np.concatenate([
                    dev["hist4_r"][:, i] + 1j * dev["hist4_i"][:, i],
                    xlr[0:2, i] + 1j * xli[0:2, i]])
        snap = (ctx.get("ps_snap") or [None] * self.C)[slot]
        if snap is not None and snap.ps_prev is not None:
            p.h_prev = snap.h_prev.copy()
            p.h_slot_imag[:] = snap.h_slot_imag
            p.ipd_hist[:17] = snap.ipd_hist
            p.opd_hist[:17] = snap.opd_hist
            p.ps_prev = snap.ps_prev
            p.is34_prev = snap.is34_prev
        return p, vl, vr

    def _readopt_sticky(self) -> set[int]:
        """Re-adopt sticky numpy-fallback slots onto the batched device
        path at a settled chunk boundary — the inverse of the warm
        seeding that diverted them (SURVEY.md §5 "per-stream error
        isolation": isolation must be temporary, not a one-way door).

        No elections are needed: SBR headers are per-slot cfg-plane
        rows, and PS band modes are per-slot state-set membership (the
        20- and 34-band sets coexist; mixed batches run the dual
        program).  Each sticky slot with a live header gets its cfg row
        re-rendered and its device state rebuilt from the numpy
        SBRChannelProc/PSProc (QMF FIFOs, X_low line, Y-carry, delay/
        allpass lines, transient trackers, dual synthesis histories)
        and its host sequential state (SBRHostState, PSPackState incl.
        the h_prev value mirror) reconstructed, then rejoins the
        batched path on the next chunk.  Returns the slots that could
        NOT be re-adopted yet (no payload seen since the divert — e.g.
        a stream that went silent); they retry at every boundary."""
        if not hasattr(self, '_sbr_ctxs'):
            return set()
        sticky = [s for s in range(self.C) if self._sbr_np_sticky[s]]
        if not sticky:
            self._readopt_blocked = set()
            return set()
        from aacjax.host import ps_pack as PP
        from aacjax.host import sbr as sbrmod
        from aacjax.host.sbr_pack import SBRHostState

        slot_stream = np.zeros(self.C, np.int32)
        for i, st in enumerate(self.streams):
            slot_stream[st.base_slot: st.base_slot + st.n_slots] = i

        # No elections: SBR headers are per-slot cfg-plane rows and PS
        # band modes per-slot state-set membership, so a sticky slot
        # re-adopts by re-rendering its OWN row (and re-seeding its OWN
        # rows of its mode's PS state set) — any header/mode mix across
        # the batch stays on the device path.

        # -- per-slot adoption ----------------------------------------------
        adopt, blocked = [], set()
        for s in sticky:
            ctx = self._sbr_ctxs[int(slot_stream[s])]
            proc = self._sbr_np_procs[s]
            ok = proc is not None and ctx.header is not None
            if ok and self._ps_pair[s] >= 0:
                pnp = self._ps_np[s]
                ok = pnp is not None and pnp[0].is34_prev is not None
            if ok:
                adopt.append(s)
            else:
                blocked.add(s)
        if adopt:
            f32 = np.float32
            ds = {k: np.array(v) for k, v in self._sbr_dev_state.items()}
            from aacjax.kernels.ps_batch import _NAP, _NB, _NPAR
            for s in adopt:
                ctx = self._sbr_ctxs[int(slot_stream[s])]
                self._set_cfg_row(
                    s, ctx.header,
                    sbrmod.derive_tables(ctx.header, ctx.sample_rate))
                proc = self._sbr_np_procs[s]
                ds["x_hist"][s] = proc.x_hist
                ds["xlow_r"][s] = proc.xlow_hist.real
                ds["xlow_i"][s] = proc.xlow_hist.imag
                ds["ytail_r"][s] = proc.y_tail.real
                ds["ytail_i"][s] = proc.y_tail.imag
                hs = SBRHostState(
                    bw=np.asarray(proc.bw, np.float64).copy(),
                    invf_prev=(None if proc.invf_prev is None
                               else np.array(proc.invf_prev)),
                    index_noise=proc.index_noise,
                    index_sine=proc.index_sine,
                    la_prev=proc.la_prev,
                    s_index_prev=(None if proc.s_index_prev is None
                                  else np.array(proc.s_index_prev)),
                    t_env_last=proc.t_env_last)
                self._sbr_host_states[s] = hs
                if self._ps_pair[s] >= 0:
                    pp, vl, vr = self._ps_np[s]
                    m = bool(pp.is34_prev)
                    nb, nap, npar = _NB[m], _NAP[m], _NPAR[m]
                    # exact per-slot rows for mode m's state set, applied
                    # by _ps_mode_begin AFTER any staleness re-seed of
                    # that set (ordering: re-seed wholesale, then overlay
                    # the adopted slot's true rows)
                    self._ps_row_seeds[m][s] = dict(
                        v_l=vl, v_r=vr,
                        hist4_r=np.stack([pp.in_hist[i][:4].real
                                          for i in range(5)], axis=1),
                        hist4_i=np.stack([pp.in_hist[i][:4].imag
                                          for i in range(5)], axis=1),
                        delay_r=pp.delay[:nb].real,
                        delay_i=pp.delay[:nb].imag,
                        ap_r=pp.ap_delay[:nap].real,
                        ap_i=pp.ap_delay[:nap].imag,
                        peak=pp.peak_decay_nrg[:npar],
                        psmooth=pp.power_smooth[:npar],
                        pdiff=pp.peak_decay_diff[:npar])
                    self._ps_slot_is34[s] = m
                    self._ps_pack_states[s] = PP.PSPackState(
                        h_prev=pp.h_prev.copy(),
                        ipd_hist=pp.ipd_hist[:17].copy(),
                        opd_hist=pp.opd_hist[:17].copy(),
                        ps_prev=pp.ps_prev,
                        is34_prev=pp.is34_prev,
                        h_slot_imag=pp.h_slot_imag.copy())
                    self._ps_np[s] = None
                else:
                    ds["v_hist"][s] = proc.v_hist
                self._sbr_np_procs[s] = None
                self._sbr_np_sticky[s] = False
            self._sbr_dev_state = {k: jnp.asarray(v, f32)
                                   for k, v in ds.items()}
        self._readopt_blocked = blocked
        return blocked

    def _he_host_phase(self, payloads_per_stream, compact=None,
                       buf_slot: int = 0):
        """Host half of one HE chunk on the native path: C core parse
        (records SBR FIL payload positions) + python parse of the ~30-byte
        SBR extensions + dense pack.  Returns (parsed_core, dense,
        ctx) for _device_step/_sbr_stage — the device half can
        run on a worker thread while the next chunk's host phase runs."""
        from aacjax.host import sbr as sbrmod
        from aacjax.host import sbr_pack as SP

        self._sbr_init()
        self._sbr_chunk_begin(payloads_per_stream)
        if compact is None:
            compact = os.environ.get("AACJAX_COMPACT", "1") == "1"
        # compact route: every dense plane is re-encoded or copied by
        # compact_dense before H2D, so the ~90 MB of plane storage can
        # be recycled per buf_slot instead of reallocated every chunk
        # (page-fault churn dominated the first-call cost on this host);
        # the non-compact route ships the planes by reference and must
        # keep fresh allocations
        dense = (SP.alloc_dense_cached(self.C, self.T, buf_slot)
                 if compact else SP.alloc_dense(self.C, self.T))
        # core spectra must stay EXACT on the HE path: the SBR envelope
        # adjuster normalizes patched bands by the source-band energy, so
        # int16 spec quantization (harmless ~90 dB on plain LC PCM) gets
        # amplified ~100x on near-empty HF source bands (measured 1.5e-2
        # rel).  The exact-i16 q/sf transfer (raw quantized coefficients
        # + sf bytes, dequantized on-device through the same LUT values
        # as the host — bit-exact) keeps exactness at 2.25 B/bin instead
        # of f32's 4; PNS/IS/M-S/CCE chunks fall back to exact f32.
        # The other dominant HE H2D cost is the SBR planes, which DO
        # compact (compact_dense, exact flags + 1/1024-log2 energies)
        parsed = self._parse_native(payloads_per_stream, buf_slot=buf_slot,
                                    compact=False, qsf=compact)
        fil = self._last_fil_sbr
        g = 0
        cache = self._sbr_parse_cache
        for i, payloads in enumerate(payloads_per_stream):
            ctx = self._sbr_ctxs[i]
            for t, payload in enumerate(payloads or []):
                for rec in fil[g]:
                    bitpos, slot, nch = int(rec[0]), int(rec[1]), int(rec[2])
                    if bitpos == 0:
                        continue
                    key = (payload, bitpos, nch)
                    sf = cache.get(key)
                    if sf is not None and sf.header == ctx.header:
                        sbrmod.apply_frame_state(ctx, sf)
                    else:
                        r = BitReader(payload)
                        r.seek_bits(bitpos)
                        ext_type = r.read(4)
                        sf = sbrmod.read_sbr_extension(
                            r, ctx, nch == 2,
                            ext_type == sbrmod.EXT_SBR_DATA_CRC)
                        if sbrmod.frame_is_context_free(sf):
                            if len(cache) > 512:
                                cache.clear()
                            cache[key] = sf
                    self._sbr_pack_payload(dense, sf, slot, nch, t)
                g += 1
        dense_out = (SP.compact_dense(dense, buf_slot) if compact
                     else dense)
        return parsed, dense_out, self._he_ctx()

    def decode_he_pipelined(self, chunk_iter, out_int16: bool = True,
                            compact: bool | None = None, mesh=None,
                            duplex: bool | None = None):
        """Generator decoding an iterator of HE-AAC payload chunks as a
        3-stage pipeline with double-buffered transfers, the HE analog of
        decode_pipelined:

            main thread    : host phase k  (core parse + SBR parse + pack)
            upload worker  : H2D + dispatch k-1 (core + SBR/PS programs)
            download worker: D2H chunk k-2 + sticky numpy replay

        Steady-state wall per chunk is max(host, H2D, D2H) instead of
        host + (H2D + compute + D2H): the upload of chunk k+1's core
        spectra and SBR planes rides alongside the download of chunk k's
        PCM.  `duplex` as in decode_pipelined — on links where transfers
        contend (the tunneled axon platform) a shared lock serializes
        H2D against D2H, both still overlapping parse and compute.
        The per-chunk SBR bookkeeping is snapshotted into an explicit
        context so the stages never share mutable chunk state.  Native
        path only.

        With `mesh` (stream-only, make_mesh(n, 1)) the device half runs
        the mesh-jitted core + SBR/PS programs (see step_he_raw)."""
        import concurrent.futures
        if not self.use_native:
            raise RuntimeError("decode_he_pipelined requires the native "
                               "parser (use step_he_raw)")
        up_pool = concurrent.futures.ThreadPoolExecutor(1)
        down_pool = concurrent.futures.ThreadPoolExecutor(1)
        up_fut = None
        down_fut = None
        slot = 0
        xfer_lock = self._transfer_lock(duplex)

        import contextlib
        lk = xfer_lock if xfer_lock is not None else contextlib.nullcontext()

        def upload_dispatch(host):
            parsed, dense, ctx = host
            with lk:
                dev = (self._upload_batch(parsed) if mesh is None
                       else self._upload_batch_sharded(parsed, mesh))
            core_pcm = (self._device_step(dev, out_int16=False)
                        if mesh is None
                        else self._device_step_sharded(dev, mesh))
            pcm2, seeds = self._sbr_dispatch(core_pcm, dense, ctx,
                                             out_int16, mesh=mesh,
                                             xfer_lock=xfer_lock)
            # as in decode_pipelined: wait for the compute to consume its
            # inputs so the double-buffered parse/pack arrays can be
            # reused two chunks ahead (zero-copy backends alias them)
            jax.block_until_ready(pcm2)
            return pcm2, seeds, core_pcm, ctx

        def download(args):
            pcm2, seeds, core_pcm, ctx = args
            return self._sbr_download(pcm2, seeds, ctx, core_pcm,
                                      xfer_lock=xfer_lock)

        try:
            self._pipeline_active = True
            for chunk in chunk_iter:
                readoptable = hasattr(self, '_sbr_np_sticky') and any(
                    self._sbr_np_sticky[s] and s not in
                    self._readopt_blocked for s in range(self.C))
                if self._deferred_resets or readoptable:
                    # resets and sticky re-adoption touch state both
                    # workers mutate (overlap carry, SBR/PS device state,
                    # numpy replay procs): drain everything in flight,
                    # then act at the settled boundary.  Re-adoption
                    # drains at most once per stickiness event — slots
                    # the election can't adopt go to _readopt_blocked
                    # and stop forcing pipeline bubbles
                    if up_fut is not None:
                        args = up_fut.result()
                        up_fut = None
                        if down_fut is not None:
                            yield down_fut.result()
                        down_fut = down_pool.submit(download, args)
                    if down_fut is not None:
                        yield down_fut.result()
                        down_fut = None
                    self._apply_deferred_resets()
                    self._readopt_sticky()
                host = self._he_host_phase(chunk, compact, buf_slot=slot)
                if up_fut is not None:
                    args = up_fut.result()
                    if down_fut is not None:
                        yield down_fut.result()
                    down_fut = down_pool.submit(download, args)
                up_fut = up_pool.submit(upload_dispatch, host)
                slot ^= 1
            if up_fut is not None:
                args = up_fut.result()
                if down_fut is not None:
                    yield down_fut.result()
                down_fut = down_pool.submit(download, args)
            if down_fut is not None:
                yield down_fut.result()
        finally:
            self._pipeline_active = False
            self._apply_deferred_resets()
            up_pool.shutdown(wait=False)
            down_pool.shutdown(wait=False)

    def step_he_raw(self, payloads_per_stream: list[list[bytes] | None],
                    compact: bool | None = None,
                    out_int16: bool = False, mesh=None) -> np.ndarray:
        """Decode one chunk of HE-AAC streams: core parse + decode exactly
        like step_raw (native C++ parse when built — the C walker records
        where each frame's SBR FIL payload sits, so python parses only the
        ~30-byte SBR extensions), then the batched device SBR stage
        chained on the device-resident core PCM.  Returns [C, T, 2*F]
        float32 in the reference 1/32768 scale at the 2x output rate.

        SBR headers are per-slot data (cfg-plane rows), so any mix of
        headers across the batch decodes in the one compiled device
        program; only a MID-chunk header change replays that slot's
        chunk on the numpy path (identical output, host-side) before
        re-adopting at the next boundary.

        With `mesh` (stream-only, make_mesh(n, 1)) BOTH device stages —
        the core spectral step and the chained SBR / SBR+PS program —
        run jitted over the mesh, sharded P('stream') on the channel-slot
        axis (multi-chip HE-AAC serving; see runtime.mesh)."""
        from aacjax.host import sbr_pack as SP
        from aacjax.host.syntax import CPEData

        # chunk boundary: pull any sticky numpy-fallback slots back onto
        # the batched device path (no chunk is in flight here)
        self._readopt_sticky()
        if self.use_native:
            parsed, dense, ctx = self._he_host_phase(
                payloads_per_stream, compact)
            core_pcm = (self._device_step(parsed, out_int16=False)
                        if mesh is None
                        else self._device_step_sharded(parsed, mesh))
            return self._sbr_stage(core_pcm, dense, ctx, out_int16,
                                   mesh=mesh)

        self._sbr_init()
        self._sbr_chunk_begin(payloads_per_stream)
        dense = SP.alloc_dense(self.C, self.T)

        # python path: full element walk with SBR contexts
        frames_per_stream: list[list | None] = []
        for i, payloads in enumerate(payloads_per_stream):
            if not payloads:
                frames_per_stream.append(None)
                continue
            st = self.streams[i]
            frames = []
            for payload in payloads:
                frame = decode_frame(BitReader(payload), st.config,
                                     st.prev_shapes,
                                     sbr_ctx=self._sbr_ctxs[i])
                self._update_shapes(st, frame)
                st.frames_decoded += 1
                frames.append(frame)
            frames_per_stream.append(frames)

        per_slot = []
        limits = []
        for st, frames in zip(self.streams, frames_per_stream):
            if frames:
                per_slot.append((st.base_slot, frames))
                limits.append(st.n_slots)
        batch, flags = pack_frames(per_slot, self.C, self.T, limits,
                                   frame_len=self.F, eld=self._eld)
        if mesh is None:
            core_pcm, self.overlap = jitted_decode_step(flags)(
                batch, self.overlap)                  # [C, T, F] device
        else:
            from aacjax.runtime import mesh as meshlib
            step = meshlib.sharded_decode_step(flags, mesh)
            overlap = jax.device_put(
                self.overlap, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("stream", None)))
            core_pcm, self.overlap = step(
                meshlib.shard_batch(mesh, batch), overlap)

        for st, frames in zip(self.streams, frames_per_stream):
            if not frames:
                continue
            for t, frame in enumerate(frames):
                slot = st.base_slot
                for elem in frame.elements:
                    nch = 2 if isinstance(elem, CPEData) else 1
                    sf = getattr(elem, 'sbr', None)
                    if sf is not None:
                        self._sbr_pack_payload(dense, sf, slot, nch, t)
                    slot += nch
        return self._sbr_stage(core_pcm, dense, self._he_ctx(),
                               out_int16, mesh=mesh)

    def decode_block(self, buffer_tail: bytes):
        """Streaming fast path: natively parse + decode ONE raw_data_block
        from the head of `buffer_tail` (which may hold many more frames —
        the parser stops at the block's END element).

        Only for single-stream, chunk_frames=1 runtimes.  Returns
        (pcm [C,1,1024] float32 in 1/32768 scale, consumed_bits) or None
        when the native parser could not cleanly decode a complete block —
        the caller then reruns the python parser, which classifies the
        miss (BitstreamUnderflow = wait for more data vs a real error).
        """
        if (not self.use_native or len(self.streams) != 1 or self.T != 1
                or not buffer_tail):
            return None
        st = self.streams[0]
        snap = (st.failed, st.last_error, st.frames_decoded)
        # streaming readChunk is a conformance surface: exact f32 transfer
        parsed = self._parse_native([[buffer_tail]], compact=False)
        if int(self._last_status[0]) != 0:
            st.failed, st.last_error, st.frames_decoded = snap
            return None
        consumed = int(self._last_consumed[0])
        pcm = self.finalize_step(self._device_step(parsed, out_int16=False))
        return pcm, consumed

    @staticmethod
    def _pad_entries(n: int) -> int:
        """Bucket coupling-entry counts so XLA compiles a handful of entry
        shapes instead of one per count (padding entries are no-ops)."""
        q = 8
        while q < n:
            q *= 2
        return q

    def _parse_native(self, payloads_per_stream, buf_slot: int = 0,
                      compact: bool | None = None, qsf: bool = False):
        """Native parse into buffer `buf_slot` (double-buffered for the
        pipelined path).  Returns a batch dict of numpy arrays.

        qsf=True requests the exact-i16 q/sf spectral transfer (raw
        quantized coefficients + per-4-bin scalefactor bytes; HE fast
        path).  It is used only when EVERY stream in the chunk rode the
        representation (native qsf_ok) — PNS / intensity / M-S / CCE /
        escape>8191 content, or an applied DRC gain, falls back to the
        exact f32 spectra for the chunk (both are always filled)."""
        if compact is None:
            # compact transfer is the DEFAULT (AACJAX_COMPACT=0 reverts):
            # block-scaled int16 spectra halve the H2D bytes (+31%
            # end-to-end recorded) at <=2-LSB int16 PCM / ~90 dB SNR vs
            # the exact f32 path (tests/test_native.py fidelity bound) —
            # below the codec's own quantization noise
            compact = os.environ.get("AACJAX_COMPACT", "1") == "1"
        if self._any_main:
            # the Main-profile predictor is bit-precision-sensitive and
            # its state feeds back across frames: ship exact spectra
            compact = False
        if self._spec_buffers is None:
            self._spec_buffers = [
                native.SpecBatchArrays(self.C, self.T, self.F),
                native.SpecBatchArrays(self.C, self.T, self.F)]
        out = self._spec_buffers[buf_slot]

        t0 = time.perf_counter()
        status, has_tns, errmsg = native.parse_batch_spec(
            payloads_per_stream, self._sample_indices, self._chan_configs,
            self._base_slots, self._n_slots, self.prev_shapes, out,
            tables_pack=self._tables_pack, want_qsf=qsf,
            want_pred=self._any_main)
        parse_seconds = time.perf_counter() - t0
        self._last_status = status
        self._last_consumed = out.consumed_bits
        self._last_fil_sbr = out.fil_sbr
        use_qsf = qsf and bool(out.qsf_ok.all())
        if self.drc_scale > 0 and out.fil_drc.any():
            t0 = time.perf_counter()
            self._apply_native_drc(payloads_per_stream, out)
            parse_seconds += time.perf_counter() - t0
            use_qsf = False  # DRC gains fold into the f32 spectra only

        for i, st in enumerate(self.streams):
            code = int(status[i])
            if code == native.ERR_FALLBACK:
                # capacity limit (e.g. no free slot for independent
                # coupling): the decoded frame prefix stays valid; name
                # the fix instead of silently de-optimizing the chunk
                st.failed = True
                st.last_error = (f"native parse: {errmsg or 'capacity'}; "
                                 "raise cce_slots to cover coupling channels")
            elif code == native.ERR_DELEGATE:
                # legal content the fast path delegates (Main+intensity,
                # prediction+coupling): step_raw redoes the chunk on the
                # python packer path; other callers surface the reason
                st.failed = True
                st.last_error = (f"native parse delegates: {errmsg}; "
                                 "decodes on the python parse path "
                                 "(use_native=False)")
            elif code != 0:
                st.failed = True
                st.last_error = (errmsg
                                 or f"native parse error code {code}")
                st.frames_decoded += len(payloads_per_stream[i] or [])
            elif payloads_per_stream[i]:
                st.frames_decoded += len(payloads_per_stream[i])

        meta = out.meta
        valid = meta[:, :, 5] != 0
        if use_qsf:
            spec_entries = dict(spec_q=out.spec_q, spec_sf=out.spec_sf)
        elif compact:
            t0 = time.perf_counter()
            spec_i16, spec_scale = native.compact_spec(out)
            parse_seconds += time.perf_counter() - t0  # host prep work
            spec_entries = dict(spec_i16=spec_i16, spec_scale=spec_scale)
        else:
            spec_entries = dict(spec=out.spec)
        # packed batch format: the native buffers travel whole and are
        # sliced inside the jitted program (pipeline._unpack_spec_batch)
        # — each extra buffer costs a full H2D RPC roundtrip
        batch = dict(**spec_entries, meta=meta)
        if has_tns:
            batch.update(tns_lpc=out.tns_lpc, tns_range=out.tns_range)
        n_post, n_time = int(out.cce_counts[0]), int(out.cce_counts[1])
        if n_post:
            q = self._pad_entries(n_post)
            idx = np.zeros((q, 3), np.int32)
            idx[:n_post] = out.cce_post_idx[:n_post]
            gain = np.zeros((q, self.F), np.float32)
            gain[:n_post] = out.cce_post_gain[:n_post]
            batch.update(cce_post_idx=idx, cce_post_gain=gain)
        if n_time:
            q = self._pad_entries(n_time)
            idx = np.zeros((q, 3), np.int32)
            idx[:n_time] = out.cce_time_idx[:n_time]
            gain = np.zeros(q, np.float32)
            gain[:n_time] = out.cce_time_gain[:n_time]
            batch.update(cce_time_idx=idx, cce_time_gain=gain)
        if self._any_main:
            batch.update(pred_meta=out.pred_meta,
                         pred_used_u8=out.pred_used)
        batch['_has_tns'] = has_tns
        batch['_has_short'] = bool(meta[:, :, 4].any())
        batch['_has_pred'] = self._any_main
        batch['_spec_i16'] = compact and not use_qsf
        batch['_spec_qsf'] = use_qsf
        batch['_has_cce_post'] = n_post > 0
        batch['_has_cce_time'] = n_time > 0
        batch['_parse_seconds'] = parse_seconds
        batch['_n_stream_frames'] = sum(
            len(p) for p in payloads_per_stream if p)
        batch['_n_channel_frames'] = int(valid.sum())
        return batch

    def _apply_native_drc(self, payloads_per_stream, out) -> None:
        """DRC on the native fast path: the C walker records each frame's
        dynamic_range_info FIL bit offset (out.fil_drc); python parses
        the ~10-byte payload and folds the per-band linear gain into the
        already-dequantized spectra.  Equivalent to the python parser's
        pre-dequant scalefactor fold: the gain is constant per bin, it
        is applied before the device TNS pass like the python path, and
        intensity/M-S fused bands inherit the pair's gain identically
        (both tools are linear in the scaled spectra)."""
        from aacjax.host.syntax import read_drc_info
        fil = out.fil_drc
        g = 0
        for i, payloads in enumerate(payloads_per_stream):
            st = self.streams[i]
            nch = st.config.channels
            for t, payload in enumerate(payloads or []):
                bitpos = int(fil[g])
                g += 1
                if bitpos == 0:
                    continue
                r = BitReader(payload)
                r.seek_bits(bitpos)
                r.read(4)                      # EXT_DYNAMIC_RANGE
                drc = read_drc_info(r, self.F)
                lin = np.power(10.0, drc.gain_db * self.drc_scale / 20.0
                               ).astype(np.float32)
                gain_bin = np.empty(self.F, np.float32)
                lo = 0
                for bi, top in enumerate(drc.band_top):
                    hi = min(int(top), self.F)
                    gain_bin[lo:hi] = lin[bi]
                    lo = hi
                gain_bin[lo:] = lin[-1]
                for c in range(nch):
                    if (drc.excluded is not None and c < len(drc.excluded)
                            and drc.excluded[c]):
                        continue
                    out.spec[st.base_slot + c, t] *= gain_bin

    def _device_step(self, batch: dict, out_int16: bool,
                     use_pallas: bool | None = None):
        has_tns = batch.pop('_has_tns')
        has_short = batch.pop('_has_short')
        has_pred = batch.pop('_has_pred', False)
        spec_i16 = batch.pop('_spec_i16')
        spec_qsf = batch.pop('_spec_qsf', False)
        has_cce_post = batch.pop('_has_cce_post')
        has_cce_time = batch.pop('_has_cce_time')
        parse_seconds = batch.pop('_parse_seconds')
        n_stream_frames = batch.pop('_n_stream_frames')
        n_channel_frames = batch.pop('_n_channel_frames')
        if use_pallas is None:
            # default: fused Pallas tail on real TPU (wins the recorded
            # hardware A/B), XLA elsewhere; AACJAX_PALLAS=1/0 overrides
            from aacjax.kernels.pallas_tail import default_on
            use_pallas = default_on()
        flags = PipelineFlags(has_stereo=False, has_tns=has_tns,
                              has_cce=False, out_int16=out_int16,
                              use_pallas=use_pallas,
                              has_cce_post=has_cce_post,
                              has_cce_time=has_cce_time,
                              spec_i16=spec_i16, spec_qsf=spec_qsf,
                              has_short=has_short, has_pred=has_pred,
                              eld=self._eld)
        step_fn = jitted_decode_spec_step(flags)
        t0 = time.perf_counter()
        if has_pred:
            # Main profile: cross-frame predictor state rides the step
            from aacjax.kernels.pipeline import pred_state_init
            if getattr(self, '_pred_state', None) is None:
                self._pred_state = pred_state_init(self.C)
            pcm, self.overlap, self._pred_state = step_fn(
                batch, self.overlap, self._pred_state)
        else:
            pcm, self.overlap = step_fn(batch, self.overlap)
        # jit dispatch is async: the step's device time is only known once
        # the result materializes, so the timing record completes in
        # finalize_step (stats never report the async dispatch as device
        # time — that would overstate throughput)
        if len(self._pending_steps) > 16:  # caller never finalized; bound it
            self._pending_steps.clear()
        self._pending_steps[id(pcm)] = (
            t0, parse_seconds, n_stream_frames, n_channel_frames)
        self.stats.streams_failed = sum(st.failed for st in self.streams)
        return pcm

    def _device_step_sharded(self, batch: dict, mesh, out_int16: bool = False):
        """Multi-chip variant of _device_step: runs the SAME production
        spectral program (decode_spec_step — compact int16 spectra,
        concealment masks, TNS, CCE entry lists) jitted over a
        ('stream', 'frame') mesh with explicit shardings.  Serving on a
        pod shards concurrent streams across chips (pure data parallel;
        zero cross-chip traffic) and optionally the frame axis within a
        stream (the overlap-add carry lowers to one halo
        collective-permute per boundary over ICI)."""
        from aacjax.runtime import mesh as meshlib
        has_tns = batch.pop('_has_tns')
        has_short = batch.pop('_has_short')
        has_pred = batch.pop('_has_pred', False)
        spec_i16 = batch.pop('_spec_i16')
        spec_qsf = batch.pop('_spec_qsf', False)
        has_cce_post = batch.pop('_has_cce_post')
        has_cce_time = batch.pop('_has_cce_time')
        parse_seconds = batch.pop('_parse_seconds')
        n_stream_frames = batch.pop('_n_stream_frames')
        n_channel_frames = batch.pop('_n_channel_frames')
        flags = PipelineFlags(has_stereo=False, has_tns=has_tns,
                              has_cce=False, out_int16=out_int16,
                              has_cce_post=has_cce_post,
                              has_cce_time=has_cce_time,
                              spec_i16=spec_i16, spec_qsf=spec_qsf,
                              has_short=has_short, has_pred=has_pred,
                              eld=self._eld)
        step_fn = meshlib.sharded_decode_spec_step(flags, mesh)
        sharded = meshlib.shard_spec_batch(mesh, batch)
        overlap = jax.device_put(
            self.overlap, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("stream", None)))
        t0 = time.perf_counter()
        if has_pred:
            from aacjax.kernels.pipeline import pred_state_init
            if getattr(self, '_pred_state', None) is None:
                self._pred_state = pred_state_init(self.C)
            pred = jax.device_put(
                self._pred_state, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("stream", None, None)))
            pcm, self.overlap, self._pred_state = step_fn(
                sharded, overlap, pred)
        else:
            pcm, self.overlap = step_fn(sharded, overlap)
        self._pending_steps[id(pcm)] = (
            t0, parse_seconds, n_stream_frames, n_channel_frames)
        self.stats.streams_failed = sum(st.failed for st in self.streams)
        return pcm

    def finalize_step(self, pcm) -> np.ndarray:
        """Materialize a _device_step result on the host and complete its
        stats record: device_seconds spans dispatch -> ready -> D2H, so
        stats.realtime_x reflects delivered PCM, not async dispatch."""
        out = np.asarray(pcm)
        pending = self._pending_steps.pop(id(pcm), None)
        if pending is not None:
            t0, parse_seconds, n_stream_frames, n_channel_frames = pending
            self.stats.add_step(parse_seconds, time.perf_counter() - t0,
                                n_stream_frames, n_channel_frames)
        return out

    def _upload_batch(self, batch: dict) -> dict:
        """H2D stage of the 3-stage pipeline: push every batch array to
        the device NOW (blocking the calling worker thread until the
        transfer lands, so the double-buffered parse arrays can be
        reused) and hand back a device-resident batch for _device_step.
        The jitted step sees committed device arrays and re-transfers
        nothing."""
        arrs = {k: v for k, v in batch.items() if not k.startswith('_')}
        dev = jax.block_until_ready(jax.device_put(arrs))
        dev.update({k: v for k, v in batch.items() if k.startswith('_')})
        return dev

    @staticmethod
    def _transfer_lock(duplex: bool | None):
        """None (transfers may overlap) or a Lock serializing H2D vs D2H.
        Auto mode: duplex on real local attachments, serialized on the
        tunneled 'axon' platform where concurrent RPC transfers contend
        destructively (measured 2-3x the serial sum)."""
        import threading
        if duplex is None:
            env = os.environ.get("AACJAX_DUPLEX")
            if env is not None:
                duplex = env == "1"
            else:
                duplex = jax.devices()[0].platform != "axon"
        return None if duplex else threading.Lock()

    def _upload_batch_sharded(self, batch: dict, mesh) -> dict:
        """Mesh variant of _upload_batch: the H2D stage lands every array
        directly in its sharded layout (device_put with a NamedSharding
        splits the transfer across chips), so _device_step_sharded's own
        shard call is a no-op on already-committed arrays."""
        from aacjax.runtime import mesh as meshlib
        arrs = {k: v for k, v in batch.items() if not k.startswith('_')}
        dev = jax.block_until_ready(meshlib.shard_spec_batch(mesh, arrs))
        dev.update({k: v for k, v in batch.items() if k.startswith('_')})
        return dev

    def decode_pipelined(self, chunk_iter, out_int16: bool = True,
                         compact: bool | None = None, mesh=None,
                         duplex: bool | None = None,
                         use_pallas: bool | None = None):
        """Generator decoding an iterator of payload chunks as a 3-stage
        pipeline with double-buffered transfers:

            main thread    : parse chunk k      (C parse releases the GIL)
            upload worker  : H2D + dispatch k-1 (device compute is async)
            download worker: D2H chunk k-2      (materialize + stats)

        All three run concurrently, so the steady-state wall per chunk is
        max(parse, H2D, D2H) instead of their sum — on a link where H2D
        and D2H are comparable and genuinely full-duplex (PCIe) the
        upload of chunk k+1 rides alongside the download of chunk k.
        Ordering between chunks is preserved by the single-threaded
        workers; the donated overlap state advances on the upload worker
        only.  Yields materialized PCM arrays in order.

        `duplex`: whether H2D and D2H may run concurrently.  On links
        that serialize transfers anyway, concurrent RPCs CONTEND
        destructively (measured on this dev tunnel: two overlapped 64 MB
        transfers take 2-3x their serial sum), so the default
        auto-detects — False on the tunneled 'axon' platform, True
        elsewhere (PCIe) — overridable here or via AACJAX_DUPLEX=0/1.
        With duplex=False a shared lock serializes the two transfer
        stages against each other; both still overlap parse and device
        compute, so the steady-state wall is parse-overlapped H2D + D2H.

        reset_stream() during iteration is deferred to the next chunk
        boundary (see request_reset).

        With `mesh` (('stream','frame'), runtime.mesh.make_mesh) every
        stage runs sharded: the H2D worker lands each array in its
        sharded layout and the device step is the mesh-jitted
        decode_spec_step — the full multi-chip serving loop."""
        import concurrent.futures
        up_pool = concurrent.futures.ThreadPoolExecutor(1)
        down_pool = concurrent.futures.ThreadPoolExecutor(1)
        up_fut = None
        down_fut = None
        slot = 0
        xfer_lock = self._transfer_lock(duplex)

        import contextlib
        lk = xfer_lock if xfer_lock is not None else contextlib.nullcontext()

        def upload_dispatch(batch):
            with lk:
                dev = (self._upload_batch(batch) if mesh is None
                       else self._upload_batch_sharded(batch, mesh))
            pcm = (self._device_step(dev, out_int16=out_int16,
                                     use_pallas=use_pallas)
                   if mesh is None
                   else self._device_step_sharded(dev, mesh,
                                                  out_int16=out_int16))
            # block until the step's COMPUTE has consumed its inputs, not
            # just until dispatch: on zero-copy backends (CPU) the
            # "device" arrays alias the double-buffered host parse
            # arrays, which the main thread overwrites two chunks ahead.
            # up_fut.result() therefore guarantees chunk k's buffers are
            # reusable before parse(k+2) begins.  Costs one device sync
            # per chunk (~ms); H2D(k+1) and D2H(k) still overlap on the
            # two workers.
            jax.block_until_ready(pcm)
            return pcm

        def download(pcm_dev):
            with lk:
                return self.finalize_step(pcm_dev)

        try:
            self._pipeline_active = True
            for chunk in chunk_iter:
                if self._deferred_resets:
                    # a reset touches state the upload worker mutates
                    # (overlap carry, prev_shapes): drain the in-flight
                    # step, then apply at this chunk boundary
                    if up_fut is not None:
                        pcm_dev = up_fut.result()
                        up_fut = None
                        if down_fut is not None:
                            yield down_fut.result()
                            down_fut = None
                        down_fut = down_pool.submit(download, pcm_dev)
                    self._apply_deferred_resets()
                parsed = self._parse_native(chunk, buf_slot=slot,
                                            compact=compact)
                if up_fut is not None:
                    pcm_dev = up_fut.result()
                    if down_fut is not None:
                        yield down_fut.result()
                    down_fut = down_pool.submit(download, pcm_dev)
                up_fut = up_pool.submit(upload_dispatch, parsed)
                slot ^= 1
            if up_fut is not None:
                pcm_dev = up_fut.result()
                if down_fut is not None:
                    yield down_fut.result()
                down_fut = down_pool.submit(download, pcm_dev)
            if down_fut is not None:
                yield down_fut.result()
        finally:
            self._pipeline_active = False
            self._apply_deferred_resets()
            up_pool.shutdown(wait=False)
            down_pool.shutdown(wait=False)

    def _step_python_raw(self, payloads_per_stream) -> np.ndarray:
        """Python-parser fallback with the same per-stream error isolation
        as the native path: a failing stream keeps its successfully parsed
        frame prefix (frames before the corrupt one decode normally); only
        the failing frame onward is dropped."""
        frames_per_stream = []
        for i, payloads in enumerate(payloads_per_stream):
            if not payloads:
                frames_per_stream.append(None)
                continue
            st = self.streams[i]
            frames: list[Frame] = []
            for payload in payloads:
                try:
                    frame = decode_frame(BitReader(payload), st.config,
                                         st.prev_shapes,
                                         drc_scale=self.drc_scale)
                except Exception as e:  # noqa: BLE001 — per-stream isolation
                    st.failed = True
                    st.last_error = str(e)
                    break
                self._update_shapes(st, frame)
                st.frames_decoded += 1
                frames.append(frame)
            frames_per_stream.append(frames or None)
        return self.step(frames_per_stream)

    # -- state save/restore (checkpoint/resume, SURVEY.md §5) ---------------
    def request_reset(self, idx: int, config: StreamConfig | None = None
                      ) -> None:
        """Serving-safe slot recycle: when a decode_pipelined /
        decode_he_pipelined generator is running, the reset is DEFERRED
        to the next chunk boundary (the generator drains its in-flight
        device step, applies pending resets, then parses the next chunk
        — so a mid-batch join/leave can never corrupt a chunk whose
        state is being mutated on the worker thread).  Outside a
        pipelined run it applies immediately."""
        if self._pipeline_active:
            self._deferred_resets.append((idx, config))
        else:
            self.reset_stream(idx, config)

    def _apply_deferred_resets(self) -> None:
        pending, self._deferred_resets = self._deferred_resets, []
        was_active, self._pipeline_active = self._pipeline_active, False
        try:
            for idx, config in pending:
                self.reset_stream(idx, config)
        finally:
            self._pipeline_active = was_active

    def reset_stream(self, idx: int, config: StreamConfig | None = None
                     ) -> None:
        """Recycle one stream's slots for a new client (serving: a stream
        ends, another joins mid-batch) without touching the other
        streams: zeroes the decoder state (overlap carry, window-shape
        history, SBR/PS/predictor state for the slot range) and clears
        the failure flag.  An optional new config swaps the stream's
        tables in place; it must keep the batch frame length, fit the
        slot budget, and match the batch's ELD-ness (those are compiled
        into the chunk program).

        While a decode_pipelined/decode_he_pipelined generator has a
        chunk in flight this raises — use request_reset, which defers to
        the next chunk boundary."""
        if self._pipeline_active:
            raise RuntimeError(
                "reset_stream during a pipelined decode would race the "
                "in-flight chunk's state; use request_reset(idx, config) "
                "— it applies at the next chunk boundary")
        st = self.streams[idx]
        if config is not None:
            if config.frame_length != self.F:
                raise ValueError(
                    f"frame length {config.frame_length} != batch {self.F}")
            if (config.profile == 39) != self._eld:
                raise ValueError("cannot swap ELD-ness of a batch slot")
            if config.channels > st.n_slots:
                raise ValueError(
                    f"config needs {config.channels} channels; stream has "
                    f"{st.n_slots} slots")
            st.config = config
            self._sample_indices[idx] = config.sample_index
            self._chan_configs[idx] = config.chan_config
            if self._tables_pack is not None:
                row = native.stream_tables([config])
                for k in ("profiles", "swb_long", "swb_long_count",
                          "swb_short", "swb_short_count", "tns_max"):
                    self._tables_pack[k][idx] = row[k][0]
        st.failed = False
        st.last_error = ""
        st.frames_decoded = 0
        lo, hi = st.base_slot, st.base_slot + st.n_slots
        self.prev_shapes[lo:hi] = 0
        self.overlap = self.overlap.at[lo:hi].set(0.0)
        if getattr(self, '_pred_state', None) is not None:
            from aacjax.kernels.pipeline import pred_state_init
            self._pred_state = self._pred_state.at[lo:hi].set(
                pred_state_init(st.n_slots))
        if hasattr(self, '_sbr_ctxs'):
            from aacjax.host import sbr as sbrmod
            from aacjax.host import sbr_pack as SP
            self._sbr_ctxs[idx] = sbrmod.SBRContext(
                sample_rate=2 * st.config.sample_rate)
            for s in range(lo, hi):
                self._sbr_host_states[s] = SP.SBRHostState()
                self._sbr_np_procs[s] = None
                self._sbr_np_sticky[s] = False
                self._readopt_blocked.discard(s)
                self._ps_np[s] = None
                if self._ps_pair[s] >= 0:
                    self._ps_pair[s] = -1
            for k, v in self._sbr_dev_state.items():
                self._sbr_dev_state[k] = v.at[lo:hi].set(0.0)
            for m, d in self._ps_dev_states.items():
                if d is not None:
                    for k, v in d.items():
                        d[k] = v.at[lo:hi].set(0.0)
            from aacjax.kernels.sbr_batch import cfg_planes_zeros
            zero_row = cfg_planes_zeros(1)
            for s in range(lo, hi):
                self._ps_slot_is34[s] = None
                for m in (False, True):
                    self._ps_row_seeds[m].pop(s, None)
                # fresh stream: zero the slot's SBR header cfg row
                if self._slot_sbr_key[s] is not None:
                    for k in self._sbr_cfg_planes:
                        self._sbr_cfg_planes[k][s] = zero_row[k][0]
                    self._slot_sbr_key[s] = None
                    self._slot_sbr_hdr[s] = None
                    self._sbr_cfg_dev = None
            from aacjax.host import ps_pack as PP
            for s in range(lo, hi):
                self._ps_pack_states[s] = PP.PSPackState()

    def save_state(self) -> dict:
        """Complete batch decoder state at a chunk boundary, as plain
        numpy arrays and picklable dataclasses: the dict round-trips
        through pickle, so a serving batch can checkpoint and resume in
        a FRESH process or BatchDecoder (SURVEY.md §5 checkpoint/resume;
        the reference's resumable state is the same set, per-channel —
        filter_bank.js:38-41 overlap + ics.js:271 window shape — plus
        everything the HE-AAC extension layers carry).

        Covers the core pipeline (overlap carry, window-shape history,
        Main-profile predictor) and, once the batch has decoded HE-AAC,
        the full SBR/PS state: device FIFOs (QMF analysis/synthesis
        histories, X_low line, VAR-overhang Y-carry), host sequential
        state (chirp smoothing, noise/sine counters, sinusoid
        persistence, scalefactor-carry parse contexts), PS pack/parse
        state and pair routing, and the sticky per-slot numpy
        processors.  Call between chunks — raises while a pipelined
        generator has a chunk in flight."""
        import copy
        if self._pipeline_active:
            raise RuntimeError("save_state with a pipelined chunk in "
                               "flight; drain the generator first")
        out = {
            'overlap': np.asarray(self.overlap),
            'prev_shapes': self.prev_shapes.copy(),
            'frames_decoded': [st.frames_decoded for st in self.streams],
        }
        if getattr(self, '_pred_state', None) is not None:
            out['pred_state'] = np.asarray(self._pred_state)
        if hasattr(self, '_sbr_ctxs'):
            out['sbr'] = dict(
                dev={k: np.asarray(v)
                     for k, v in self._sbr_dev_state.items()},
                ctxs=copy.deepcopy(self._sbr_ctxs),
                host=copy.deepcopy(self._sbr_host_states),
                procs=copy.deepcopy(self._sbr_np_procs),
                sticky=list(self._sbr_np_sticky),
                slot_hdr=copy.deepcopy(self._slot_sbr_hdr),
                ps_enabled=self._ps_enabled,
                ps_slot_is34=list(self._ps_slot_is34),
                ps_fresh=dict(self._ps_fresh),
                ps_row_seeds=copy.deepcopy(self._ps_row_seeds),
                ps_pair=list(self._ps_pair),
                ps_pack=copy.deepcopy(self._ps_pack_states),
                ps_np=copy.deepcopy(self._ps_np),
                ps_dev={m: (None if d is None else
                            {k: np.asarray(v) for k, v in d.items()})
                        for m, d in self._ps_dev_states.items()})
        return out

    def restore_state(self, state: dict) -> None:
        """Inverse of save_state; the target decoder must have the same
        stream layout (C, T, frame length).  Deep-copies host objects so
        the caller's checkpoint stays reusable."""
        import copy
        self.overlap = jnp.asarray(state['overlap'])
        self.prev_shapes[:] = state['prev_shapes']  # in place: keeps views
        for st, n in zip(self.streams, state['frames_decoded']):
            st.frames_decoded = n
        if 'pred_state' in state:
            self._pred_state = jnp.asarray(state['pred_state'])
        if 'sbr' in state:
            from aacjax.host import ps_pack as PP
            self._sbr_init()
            s = state['sbr']
            self._sbr_dev_state = {k: jnp.asarray(v)
                                   for k, v in s['dev'].items()}
            self._sbr_ctxs = copy.deepcopy(s['ctxs'])
            self._sbr_host_states = copy.deepcopy(s['host'])
            self._sbr_np_procs = copy.deepcopy(s['procs'])
            self._sbr_np_sticky = list(s['sticky'])
            # re-render each slot's cfg-plane row from its restored
            # header (table identity is process-local, so rows rebuild
            # from derive_tables in THIS process's cache)
            from aacjax.host import sbr as sbrmod
            from aacjax.kernels.sbr_batch import cfg_planes_zeros
            self._sbr_cfg_planes = cfg_planes_zeros(self.C)
            self._slot_sbr_key = [None] * self.C
            self._slot_sbr_hdr = [None] * self.C
            self._sbr_cfg_dev = None
            slot_rate = np.zeros(self.C, np.int64)
            for st, ctx in zip(self.streams, self._sbr_ctxs):
                slot_rate[st.base_slot: st.base_slot + st.n_slots] = \
                    ctx.sample_rate
            for sl, hdr in enumerate(copy.deepcopy(s['slot_hdr'])):
                if hdr is not None:
                    self._set_cfg_row(sl, hdr, sbrmod.derive_tables(
                        hdr, int(slot_rate[sl])))
            self._readopt_blocked = set()
            self._ps_enabled = s['ps_enabled']
            self._ps_slot_is34 = list(s['ps_slot_is34'])
            self._ps_fresh = dict(s['ps_fresh'])
            self._ps_row_seeds = copy.deepcopy(s['ps_row_seeds'])
            self._ps_pair = list(s['ps_pair'])
            self._ps_pack_states = copy.deepcopy(s['ps_pack'])
            self._ps_np = copy.deepcopy(s['ps_np'])
            self._ps_dev_states = {
                m: (None if d is None else
                    {k: jnp.asarray(v) for k, v in d.items()})
                for m, d in s['ps_dev'].items()}
            self._ps_dense = (PP.alloc_ps_dense(self.C, self.T)
                              if self._ps_enabled else None)
