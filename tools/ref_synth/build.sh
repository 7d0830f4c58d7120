#!/bin/sh
# Build the reference synthesis engine against a weight blob exported by
# lpcnet_tpu.utils.export_ref. Output binary: $OUT/ref_synth.
# $3: "e2e" = END2END flavor; "dotprod" = the reference's DEFAULT int8
# deployment path (DOT_PROD, portable vec.h 8x4 kernels) — needs a blob
# exported with quantize=True (int8 qweight records).
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
OUT=${2:-$(mktemp -d)}
E2E=""
DOTP="-DDISABLE_DOT_PROD"
if [ "${3:-}" = "e2e" ]; then E2E="-DFORCE_END2END"; fi
if [ "${3:-}" = "dotprod" ]; then DOTP=""; fi
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ $DOTP -DUSE_WEIGHTS_FILE $E2E \
  -I"$HERE" -I$REF/include -I$REF/src \
  $REF/src/lpcnet.c $REF/src/nnet.c $REF/src/freq.c $REF/src/kiss_fft.c \
  $REF/src/pitch.c $REF/src/burg.c $REF/src/kiss99.c $REF/src/parse_lpcnet_weights.c \
  $REF/src/lpcnet_tables.c "$HERE"/nnet_data.c "$HERE"/stubs.c "$HERE"/main.c \
  -lm -o "$OUT"/ref_synth
echo "$OUT/ref_synth"
