#!/bin/sh
# Build the FULL reference PLC engine against a combined LPCNet+PLC weight
# blob (export_lpcnet_blob + export_plc_blob arrays in one file). Uses the
# real plc_data.h in this dir (include order puts it before ref_synth's
# stub). Pass "noncausal" as $3 to build the FEATURES_DELAY=0 variant the
# non-causal modes require (lpcnet_plc.c:356-361).
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
SYNTH=$(dirname "$HERE")/ref_synth
OUT=${2:-$(mktemp -d)}
INC_FIRST="$HERE"
if [ "${3:-}" = "noncausal" ]; then
  mkdir -p "$OUT/nc_include"
  sed 's/#define FEATURES_DELAY 2/#define FEATURES_DELAY 0/' \
    "$SYNTH"/nnet_data.h > "$OUT/nc_include/nnet_data.h"
  INC_FIRST="$OUT/nc_include -I$HERE"
fi
# DOTPROD=1: the reference's default int8 path (needs quantize=True blobs)
DOTP="-DDISABLE_DOT_PROD"
if [ "${DOTPROD:-0}" = "1" ]; then DOTP=""; fi
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ $DOTP -DUSE_WEIGHTS_FILE \
  -I$INC_FIRST -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/lpcnet_plc.c $REF/src/lpcnet.c $REF/src/lpcnet_enc.c \
  $REF/src/nnet.c $REF/src/freq.c $REF/src/kiss_fft.c $REF/src/pitch.c \
  $REF/src/burg.c $REF/src/common.c $REF/src/kiss99.c \
  $REF/src/parse_lpcnet_weights.c $REF/src/lpcnet_tables.c \
  "$SYNTH"/nnet_data.c "$SYNTH"/stubs.c "$HERE"/codebook_stubs.c "$HERE"/plc_init.c \
  "$HERE"/engine_main.c -lm -o "$OUT"/ref_plc_engine \
  > "$OUT"/build.log 2>&1 || {
    grep -v warning "$OUT"/build.log >&2 || true
    exit 1
  }
echo "$OUT"/ref_plc_engine
