#!/bin/bash
# Test runner: forces local CPU JAX with 8 virtual devices.
#
# The container's PYTHONPATH injects an axon sitecustomize that routes
# ALL XLA compiles (even CPU) through a remote-compile relay — minutes
# of wall clock per tiny test. Tests never need the TPU tunnel, so run
# them with a clean PYTHONPATH. (TPU verification/bench runs use the
# default environment instead; see .claude/skills/verify/SKILL.md.)
cd "$(dirname "$0")"
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
