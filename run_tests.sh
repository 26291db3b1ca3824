#!/bin/bash
# Test launcher for the axon sandbox: the axon PJRT plugin must be
# disabled BEFORE the interpreter starts (sitecustomize registers it),
# so tests run on the virtual 8-device CPU mesh, not the tunnelled TPU.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest "$@"
