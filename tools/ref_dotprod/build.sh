#!/bin/sh
# Build the DOT_PROD probes against the reference nnet.c with the portable
# int8 kernels: ref_gates (gate_main.c, bare GRU steps) and ref_tail
# (tail_main.c, the full sample-rate engine with injected conditions).
# $3 "su" adds USE_SU_BIAS (the unsigned AVX/NEON flavor's numerics).
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
OUT=${2:-$(mktemp -d)}
SU=""
if [ "${3:-}" = "su" ]; then SU="-DUSE_SU_BIAS"; fi
test -f "$REF/src/nnet.c"
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ $SU -DUSE_WEIGHTS_FILE \
  -I"$HERE"/../ref_synth -I$REF/include -I$REF/src \
  $REF/src/nnet.c $REF/src/parse_lpcnet_weights.c $REF/src/kiss99.c \
  "$HERE"/../ref_synth/nnet_data.c "$HERE"/gate_main.c \
  -lm -o "$OUT"/ref_gates
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ $SU -DUSE_WEIGHTS_FILE \
  -I"$HERE"/../ref_synth -I$REF/include -I$REF/src \
  $REF/src/nnet.c $REF/src/parse_lpcnet_weights.c $REF/src/kiss99.c \
  "$HERE"/../ref_synth/nnet_data.c "$HERE"/tail_main.c \
  -lm -o "$OUT"/ref_tail
echo "$OUT/ref_gates"
echo "$OUT/ref_tail"
