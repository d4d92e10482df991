"""Test configuration.

The container's sitecustomize imports jax and registers the TPU backend at
interpreter *startup*, before any conftest/test code runs, so the platform
cannot be chosen from inside Python.  Tests therefore run on whatever
backend the environment provides:

  * plain `python -m pytest tests/ -x -q`      -> the configured backend
    (single real TPU chip under axon, or CPU elsewhere); mesh tests that
    need 8 devices auto-skip.
  * `scripts/test_cpu.sh`                      -> CPU with 8 virtual
    devices (XLA_FLAGS=--xla_force_host_platform_device_count=8), the
    full suite including the ('stream','frame') mesh sharding tests —
    "multi-node without a cluster" (SURVEY.md §4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The serving default is COMPACT transfer (block-scaled int16 spectra,
# ~90 dB SNR, +31% end-to-end).  Tests pin the exact f32 mode so the
# many native-vs-python / oracle comparisons stay bit-tight; compact
# fidelity has its own explicit bounded tests
# (test_native.test_compact_spec_transfer_close_to_exact,
#  test_sbr_batch.test_compact_dense_transfer_close_to_exact).
os.environ.setdefault("AACJAX_COMPACT", "0")
