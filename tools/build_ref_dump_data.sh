#!/bin/sh
# Build the reference's dump_data feature extractor WITHOUT model weights
# (generated nnet_data/plc_data/ceps_codebooks stubbed — the -test/-train
# feature paths never read them). Produces the file-level golden
# tests/golden/ref_feats.f32 from tests/golden/speech.s16.
#
# NOTE: regenerated goldens are NOT byte-identical to the stored one —
# dump_data seeds its +-0.5 input dither from the PID (dump_data.c:142
# srand(getpid())). Observed run-to-run feature spread: ~1e-3 mean, with
# rare pitch flips on ambiguous frames; the tolerances in
# tests/test_ref_parity.py absorb both.
set -e
REF=${1:-/root/reference}
OUT=$(mktemp -d)
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
  $REF/src/dump_data.c $REF/src/lpcnet_enc.c $REF/src/freq.c \
  $REF/src/kiss_fft.c $REF/src/pitch.c $REF/src/common.c $REF/src/burg.c \
  $REF/src/lpcnet_tables.c $OUT/stubs.c -lm -o $OUT/dump_data_ref 2>/dev/null
echo "built $OUT/dump_data_ref"
echo "usage: $OUT/dump_data_ref -test tests/golden/speech.s16 tests/golden/ref_feats.f32"
