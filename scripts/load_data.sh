#!/usr/bin/env bash
# Unpack a corpus archive into the data/ layout the framework expects
# (ref: scripts/load_data.sh unzipped data.zip the same way).
#
# Layout: data/<genre>/<composer>/*.mid for the genres/composers listed in
# music_generator_tpu/config.py (3 genres, 23 composers).
set -euo pipefail
cd "$(dirname "$0")/.."
ARCHIVE="${1:-data.zip}"
if [ ! -f "$ARCHIVE" ]; then
    echo "usage: $0 [archive.zip]  (expects a zip containing data/<genre>/<composer>/*.mid)" >&2
    exit 1
fi
unzip -o "$ARCHIVE"
find data -name '*.mid' | wc -l | xargs echo "MIDI files available:"
