#!/bin/sh
# Build the reference DRED RDO-VAE encoder/decoder parity driver.
# Optional $3 = directory with GENERATED dred_rdovae_stats_data.{h,c}
# (from lpcnet_tpu.utils.export_ref.export_rdovae_stats_c); without it the
# zero stub header is used and the `stats` mode is meaningless.
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
SYNTH=$(dirname "$HERE")/ref_synth
OUT=${2:-$(mktemp -d)}
STATS=${3:-}
if [ -n "$STATS" ]; then
  INC="-I$STATS -I$HERE"
  EXTRA="$STATS/dred_rdovae_stats_data.c"
else
  INC="-I$HERE"
  EXTRA=""
fi
gcc -O2 -U__SSE2__ -U__AVX__ -U__SSE__ -DDISABLE_DOT_PROD \
  -include "$HERE"/dred_rdovae_constants.h -include string.h \
  $INC -I"$SYNTH" -I$REF/include -I$REF/src \
  $REF/src/dred_rdovae_enc.c $REF/src/dred_rdovae_dec.c \
  $REF/src/dred_rdovae.c $EXTRA \
  $REF/src/nnet.c $REF/src/kiss99.c $REF/src/parse_lpcnet_weights.c \
  "$HERE"/dred_main.c -lm -o "$OUT"/ref_dred > "$OUT"/build.log 2>&1 || {
    grep -v warning "$OUT"/build.log >&2 || true
    exit 1
  }
echo "$OUT"/ref_dred
