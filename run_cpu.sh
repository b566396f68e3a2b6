#!/bin/bash
# Run a python command on CPU (bypasses the axon TPU preload).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" "$@"
