#!/usr/bin/env bash
# Build the native components (the reference's env-setup scripts installed
# CUDA + python-midi — ref: scripts/cuda.sh, scripts/python.sh; here the only
# native artifact is the C++ MIDI decoder, and JAX ships libtpu itself).
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
echo "native decoder built: native/libdeepj_midi.so"
