"""Multi-chip sharding of the decode pipeline (SURVEY.md §2.10, §5.7-5.8).

Parallel axes:
  * 'stream' — data parallelism over channel slots (concurrent streams).
    All per-channel math is slot-local; M/S + intensity pair gathers are
    stream-local so they never cross shards when whole streams land on one
    shard (the packer allocates slots contiguously per stream).
  * 'frame'  — sequence parallelism over the frame axis.  Every frame's
    IMDCT is independent; the only cross-frame coupling is the overlap-add
    carry pcm[t] = first[t] + second[t-1], a shifted add along T whose
    halo is one 1024-sample row per shard boundary — GSPMD lowers it to a
    single collective-permute over ICI, the analog of ring-attention's
    block handoff.

Scaling streams across hosts needs no cross-host communication at all
(each host's streams are self-contained); within a pod, ICI carries the
frame-axis halo and any residual pair traffic.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aacjax.kernels.pipeline import PipelineFlags, decode_step


def make_mesh(n_stream: int, n_frame: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_stream * n_frame, (
        f"need {n_stream * n_frame} devices, have {devices.size}")
    grid = devices[: n_stream * n_frame].reshape(n_stream, n_frame)
    return Mesh(grid, ("stream", "frame"))


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """PartitionSpecs for every batch array."""
    spec3 = P("stream", "frame", None)
    spec2 = P("stream", "frame")
    out = {}
    for k, v in batch.items():
        if k in ("pair_l", "pair_r"):
            out[k] = NamedSharding(mesh, P(None))
        elif k in ("ms_mask", "is_scale"):
            out[k] = NamedSharding(mesh, P(None, "frame", None))
        elif k.startswith("cce_src") or k.startswith("cce_dst"):
            out[k] = NamedSharding(mesh, P(None))
        elif k.startswith("cce_gain"):
            out[k] = NamedSharding(mesh, P(None, "frame", None))
        elif k == "last_valid":
            out[k] = NamedSharding(mesh, P("stream"))
        elif v.ndim >= 3:
            out[k] = NamedSharding(mesh, spec3)
        else:
            out[k] = NamedSharding(mesh, spec2)
    return out


@functools.lru_cache(maxsize=None)
def sharded_decode_step(flags: PipelineFlags, mesh: Mesh):
    """jit-compiled decode step with explicit input/output shardings over
    the ('stream', 'frame') mesh."""
    overlap_sharding = NamedSharding(mesh, P("stream", None))
    pcm_sharding = NamedSharding(mesh, P("stream", "frame", None))

    def fn(batch, overlap_in):
        return decode_step(batch, overlap_in, flags)

    return jax.jit(
        fn,
        donate_argnums=(1,),
        out_shardings=(pcm_sharding, overlap_sharding),
    )


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    shardings = batch_shardings(mesh, batch)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


# -- production spec path ----------------------------------------------------
# The serving path (BatchDecoder._parse_native -> decode_spec_step) ships a
# different batch layout than the python packer: final f32 spectra (or
# compact block-scaled int16 + per-block scales), per-channel-frame meta,
# TNS lpc/ranges, concealment masks, and global CCE entry lists.  Everything
# leads with the [C, T] (channel-slot, frame) axes, so the same 2-D
# ('stream', 'frame') mesh applies; the CCE entry lists index arbitrary
# (slot, t) pairs and stay replicated (GSPMD gathers across shards).

def spec_batch_shardings(mesh: Mesh, batch: dict) -> dict:
    out = {}
    for k, v in batch.items():
        if k.startswith("cce_"):
            out[k] = NamedSharding(mesh, P(None))
        elif k == "last_valid":
            out[k] = NamedSharding(mesh, P("stream"))
        elif v.ndim >= 3:
            out[k] = NamedSharding(
                mesh, P("stream", "frame", *([None] * (v.ndim - 2))))
        else:
            out[k] = NamedSharding(mesh, P("stream", "frame"))
    return out


@functools.lru_cache(maxsize=None)
def sharded_decode_spec_step(flags, mesh: Mesh):
    """jit-compiled production spectral step (native-packed serving path)
    with explicit shardings over the ('stream', 'frame') mesh."""
    from aacjax.kernels.pipeline import decode_spec_step
    overlap_sharding = NamedSharding(mesh, P("stream", None))
    pcm_sharding = NamedSharding(mesh, P("stream", "frame", None))
    if flags.has_pred:
        # Main profile: the [C,672,6] predictor state is slot-local and
        # rides the step sharded over 'stream' like the overlap buffer
        pred_sharding = NamedSharding(mesh, P("stream", None, None))

        def fn_pred(batch, overlap_in, pred_state):
            return decode_spec_step(batch, overlap_in, flags, pred_state)

        return jax.jit(
            fn_pred,
            donate_argnums=(1, 2),
            out_shardings=(pcm_sharding, overlap_sharding, pred_sharding),
        )

    def fn(batch, overlap_in):
        return decode_spec_step(batch, overlap_in, flags)

    return jax.jit(
        fn,
        donate_argnums=(1,),
        out_shardings=(pcm_sharding, overlap_sharding),
    )


def shard_spec_batch(mesh: Mesh, batch: dict) -> dict:
    shardings = spec_batch_shardings(mesh, batch)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


# -- batched SBR / Parametric Stereo programs --------------------------------
# The HE-AAC device stages (kernels.sbr_batch / kernels.ps_batch) batch on a
# leading channel-slot axis; every dense plane (sbr_pack / ps_pack, compact
# or not) and every QMF/synthesis state FIFO is slot-local, so a 1-D
# 'stream' mesh shards them with zero collectives.  The frame axis is NOT
# shardable here: QMF analysis windows straddle consecutive frames inside
# the chunk (xall concatenates the whole chunk's slots), so SBR runs on a
# stream-only mesh — make_mesh(n, 1).  The PS program's output routing
# (out_src/out_role: output slot c emits a channel role of source slot
# src[c]) is the one cross-slot access; GSPMD lowers that row gather to a
# collective only when a mono-source/stereo-output pair straddles a shard
# boundary — the packer allocates them adjacently, so whole streams land on
# one shard and the gather stays local.

def stream_tree_shardings(mesh: Mesh, tree: dict) -> dict:
    """P('stream') over the leading channel-slot axis of every array."""
    return {k: NamedSharding(mesh, P("stream", *([None] * (v.ndim - 1))))
            for k, v in tree.items()}


def shard_stream_tree(mesh: Mesh, tree: dict) -> dict:
    sh = stream_tree_shardings(mesh, tree)
    return {k: jax.device_put(v, sh[k]) for k, v in tree.items()}


@functools.lru_cache(maxsize=None)
def sharded_sbr_apply(mesh: Mesh, out_int16: bool = False):
    """jit-compiled batched SBR stage (kernels.sbr_batch.sbr_apply) over a
    stream-only mesh; inputs arrive pre-sharded via shard_stream_tree and
    the donated state keeps its sharding across chained chunks.  The
    per-slot SBR cfg planes are a (P('stream')-sharded) runtime arg, so
    mixed headers share the one compiled program."""
    from aacjax.kernels.sbr_batch import sbr_apply

    def fn(core_pcm, dense, state, cfg):
        return sbr_apply(core_pcm, dense, state, cfg, out_int16=out_int16)

    return jax.jit(fn, donate_argnums=(2,))


@functools.lru_cache(maxsize=None)
def _sharded_sbr_ps_apply(mesh: Mesh, out_int16: bool, is34: bool,
                          modes: tuple):
    from aacjax.kernels.ps_batch import sbr_ps_apply

    def fn(core_pcm, dense, ps_dense, state, ps_state, cfg):
        return sbr_ps_apply(core_pcm, dense, ps_dense, state, ps_state,
                            cfg, out_int16, is34)

    return jax.jit(fn, donate_argnums=(3, 4))


def sharded_sbr_ps_apply(mesh: Mesh, out_int16: bool = False,
                         is34: bool = False):
    """jit-compiled SBR + Parametric Stereo program over a stream-only
    mesh (kernels.ps_batch.sbr_ps_apply).  The PS kernel modes
    (AACJAX_PS_SCAN / AACJAX_PS_LUT) are part of the cache key, like
    the single-device jitted_sbr_ps_apply."""
    from aacjax.kernels.ps_batch import kernel_modes
    return _sharded_sbr_ps_apply(mesh, out_int16, is34,
                                 kernel_modes())


@functools.lru_cache(maxsize=None)
def _sharded_sbr_ps_apply_dual(mesh: Mesh, out_int16: bool, modes: tuple):
    from aacjax.kernels.ps_batch import sbr_ps_apply_dual

    def fn(core_pcm, dense, ps_dense, state, ps20, ps34, cfg):
        return sbr_ps_apply_dual(core_pcm, dense, ps_dense, state,
                                 ps20, ps34, cfg, out_int16)

    return jax.jit(fn, donate_argnums=(3, 4, 5))


def sharded_sbr_ps_apply_dual(mesh: Mesh, out_int16: bool = False):
    """Mixed 20/34-band SBR+PS program over a stream-only mesh (see
    kernels.ps_batch.sbr_ps_apply_dual)."""
    from aacjax.kernels.ps_batch import kernel_modes
    return _sharded_sbr_ps_apply_dual(mesh, out_int16, kernel_modes())


# -- TPU-batched encoder ------------------------------------------------------
# Both encoder dispatches (encode_batch._analysis_fn / _quantize_fn) lead
# with a flat channel-row axis (B = streams*channels on the analysis inputs,
# N = B*n_frames on everything downstream).  Every op is row-local — the
# windowed-MDCT einsums, band matmuls, psy spreading scan and the Huffman
# cost grid never mix rows — so a 1-D P('stream') sharding over the leading
# axis encodes with ZERO collectives: pure data parallelism, the encode
# mirror of decode_spec_step's stream axis.  (The [B, L] -> [N, 2F] overlap
# segmentation reshapes split the major axis only, so GSPMD keeps each
# B-row's n_frames child rows on the B-row's shard.)

def _row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("stream", *([None] * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def sharded_encode_analysis(sample_index: int, cutoff_bin: int, frame: int,
                            n_frames: int, psy_key: tuple, mesh: Mesh):
    """jit-compiled encoder analysis with explicit P('stream') shardings
    over the leading channel-row axis (encode_batch dispatch 1)."""
    from aacjax.encode_batch import _analysis_fn
    fn = _analysis_fn(sample_index, cutoff_bin, frame, n_frames, psy_key)
    row2 = _row_sharding(mesh, 2)
    return jax.jit(
        fn,
        in_shardings=(row2, row2, row2),
        out_shardings=(row2,) * 5,
    )


@functools.lru_cache(maxsize=None)
def sharded_encode_quantize(mesh: Mesh, w8: int,
                            sample_index: int | None = None,
                            cutoff_bin: int | None = None):
    """jit-compiled encoder quantize with P('stream') row shardings
    (encode_batch dispatch 2); w8 as in encode_batch._quantize_fn
    (packed coded-region D2H width)."""
    from aacjax.encode_batch import _quantize_fn
    row2 = _row_sharding(mesh, 2)
    row1 = _row_sharding(mesh, 1)
    return jax.jit(
        _quantize_fn(w8, sample_index, cutoff_bin),
        in_shardings=(row2, row2, row2, row2, row1, row1),
        out_shardings=(row2, row2),
    )
