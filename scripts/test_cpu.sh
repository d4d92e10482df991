#!/usr/bin/env bash
# Full test suite on CPU with 8 virtual devices (exercises the
# ('stream','frame') mesh sharding tests without TPU hardware).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
exec python -m pytest tests/ -q "$@"
