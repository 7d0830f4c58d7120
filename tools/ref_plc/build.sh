#!/bin/sh
# Build the reference PLC-network driver (compute_plc_pred twin) against
# blobs from lpcnet_tpu.utils.export_ref.export_plc_blob.
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
SYNTH=$(dirname "$HERE")/ref_synth
OUT=${2:-$(mktemp -d)}
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ -DDISABLE_DOT_PROD \
  -I"$HERE" -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/nnet.c $REF/src/kiss99.c $REF/src/parse_lpcnet_weights.c \
  "$HERE"/plc_main.c -lm -o "$OUT"/ref_plc > "$OUT"/build.log 2>&1 || {
    grep -v warning "$OUT"/build.log >&2 || true
    exit 1
  }
echo "$OUT"/ref_plc
