"""aacjax — a TPU-native AAC-LC decoding framework.

Host side (aacjax.host): serial bitstream demux/parse (ADTS, ASC, Huffman,
syntactic elements) producing dense per-frame tensors.  Device side
(aacjax.kernels): batched JAX/Pallas spectral processing — dequantization,
stereo tools, TNS, IMDCT synthesis — compiled once and shared across all
streams.  aacjax.runtime batches frames across concurrent streams and shards
them over a jax.sharding.Mesh.

Public API mirrors the reference decoder's surface (aac.js: decoder.js,
adts_demuxer.js): see aacjax.api.
"""
from aacjax.api import (AACDecoder, StreamConfig, decode_adts,  # noqa: F401
                        decode_loas, decode_m4a, probe)
from aacjax.host.latm import probe_loas  # noqa: F401
from aacjax.host.mp4 import probe as probe_m4a  # noqa: F401
from aacjax.file import AACFile  # noqa: F401
from aacjax.encode import AACEncoder, encode_adts, encode_m4a  # noqa: F401
from aacjax.encode_he import HEAACEncoder, encode_he_adts  # noqa: F401
from aacjax.host.asc import make_asc, parse_asc  # noqa: F401
from aacjax.runtime.batch import BatchDecoder  # noqa: F401

__version__ = "0.1.0"
