#!/bin/sh
# Build the reference DRED RDO-VAE encoder/decoder parity driver.
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
SYNTH=$(dirname "$HERE")/ref_synth
OUT=${2:-$(mktemp -d)}
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ -DDISABLE_DOT_PROD \
  -I"$HERE" -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/dred_rdovae_enc.c $REF/src/dred_rdovae_dec.c \
  $REF/src/nnet.c $REF/src/kiss99.c $REF/src/parse_lpcnet_weights.c \
  "$HERE"/dred_main.c -lm -o "$OUT"/ref_dred 2>&1 | grep -v warning || true
echo "$OUT"/ref_dred
