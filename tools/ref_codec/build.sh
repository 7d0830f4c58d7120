#!/bin/sh
# Build the reference 1.6 kb/s encoder with codebooks from a C file
# (generate with: python -m lpcnet_tpu vq-train + export, or the test's
# helper which writes codebooks.c from our codebook params).
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
CODEBOOKS=${2:-"$HERE"/codebooks.c}
OUT=${3:-$(mktemp -d)}
SYNTH=$(dirname "$HERE")/ref_synth
gcc -O2 -DDISABLE_DOT_PROD \
  -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/lpcnet_enc.c $REF/src/freq.c $REF/src/kiss_fft.c \
  $REF/src/pitch.c $REF/src/burg.c $REF/src/common.c \
  $REF/src/lpcnet_tables.c "$CODEBOOKS" "$HERE"/enc_main.c \
  -lm -o "$OUT"/ref_encode
gcc -O2 -DDISABLE_DOT_PROD \
  -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/lpcnet_dec.c $REF/src/lpcnet_enc.c $REF/src/freq.c \
  $REF/src/kiss_fft.c $REF/src/pitch.c $REF/src/burg.c $REF/src/common.c \
  $REF/src/lpcnet_tables.c "$CODEBOOKS" "$HERE"/dec_main.c \
  -lm -o "$OUT"/ref_decode
echo "$OUT"/ref_encode
