#!/bin/sh
# Build the reference's dump_data feature extractor WITHOUT model weights
# (generated nnet_data/plc_data/ceps_codebooks stubbed — the -test/-train
# feature paths never read them). Produces the file-level golden
# tests/golden/ref_feats.f32 from tests/golden/speech.s16.
#
# The reference unconditionally adds +-0.5 dither seeded from the PID
# (dump_data.c:142 srand(getpid()), :272), which makes its output
# nondeterministic run-to-run (~1e-3 mean feature spread, rare pitch flips
# on ambiguous frames). Since we compile it from source anyway, the default
# build here STRIPS the dither line so the golden is deterministic and the
# parity contract can be asserted at the ~1e-4 class (SURVEY.md Phase 1).
# Pass DITHER=1 in the environment to keep the original dithered behavior.
set -e
REF=${1:-/root/reference}
OUT=$(mktemp -d)
DUMP_SRC=$REF/src/dump_data.c
if [ "${DITHER:-0}" != "1" ]; then
  # strip the input dither (dump_data.c:272) for a deterministic build
  sed 's%^.*x\[i\] += rand()/(float)RAND_MAX - \.5;.*$%    ;/* dither stripped for deterministic parity goldens */%' \
    $REF/src/dump_data.c > $OUT/dump_data_nodither.c
  grep -q 'dither stripped' $OUT/dump_data_nodither.c || {
    echo "dither line not found in $REF/src/dump_data.c" >&2; exit 1; }
  DUMP_SRC=$OUT/dump_data_nodither.c
fi
cat > $OUT/nnet_data.h <<'H'
#ifndef NNET_DATA_H
#define NNET_DATA_H
#include "nnet.h"
#define GRU_A_STATE_SIZE 384
#define GRU_B_STATE_SIZE 16
#define FEATURES_DELAY 2
typedef struct { float gru_a_state[GRU_A_STATE_SIZE]; float gru_b_state[GRU_B_STATE_SIZE]; } NNetState;
typedef struct { int dummy; } LPCNetModel;
#endif
H
cat > $OUT/plc_data.h <<'H'
#ifndef PLC_DATA_H
#define PLC_DATA_H
#define PLC_GRU1_STATE_SIZE 256
#define PLC_GRU2_STATE_SIZE 256
typedef struct { float gru1_state[PLC_GRU1_STATE_SIZE]; float gru2_state[PLC_GRU2_STATE_SIZE]; } PLCNetState;
typedef struct { int dummy; } PLCModel;
#endif
H
cat > $OUT/stubs.c <<'H'
float ceps_codebook1[1024*17];
float ceps_codebook2[1024*17];
float ceps_codebook3[1024*17];
float ceps_codebook_diff4[4096*18];
void decode_packet(float f[4][36], float *m, const unsigned char b[8]) {}
H
gcc -O2 -march=native -DDISABLE_DOT_PROD -I$OUT -I$REF/include -I$REF/src \
  $DUMP_SRC $REF/src/lpcnet_enc.c $REF/src/freq.c \
  $REF/src/kiss_fft.c $REF/src/pitch.c $REF/src/common.c $REF/src/burg.c \
  $REF/src/lpcnet_tables.c $OUT/stubs.c -lm -o $OUT/dump_data_ref 2>/dev/null
echo "built $OUT/dump_data_ref"
echo "usage: $OUT/dump_data_ref -test tests/golden/speech.s16 tests/golden/ref_feats.f32"
