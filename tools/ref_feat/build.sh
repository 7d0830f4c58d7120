#!/bin/sh
# Build the reference's streaming single-frame feature extractor
# (lpcnet_compute_single_frame_features) standalone. Model-data headers are
# stubbed exactly as in tools/build_ref_dump_data.sh — the feature path
# never reads them. Prints the binary path on the last line.
set -e
REF=${1:-/root/reference}
OUT=${2:-$(mktemp -d)}
mkdir -p "$OUT"
HERE=$(dirname "$0")
SYNTH=$(dirname "$HERE")/ref_synth
cat > "$OUT"/stubs_cb.c <<'H'
float ceps_codebook1[1024*17];
float ceps_codebook2[1024*17];
float ceps_codebook3[1024*17];
float ceps_codebook_diff4[4096*18];
H
gcc -O2 -DDISABLE_DOT_PROD \
  -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/lpcnet_enc.c $REF/src/freq.c $REF/src/kiss_fft.c \
  $REF/src/pitch.c $REF/src/burg.c $REF/src/common.c \
  $REF/src/lpcnet_tables.c "$OUT"/stubs_cb.c "$HERE"/single_main.c \
  -lm -o "$OUT"/ref_single_features
echo "$OUT"/ref_single_features
