/* Reference single-frame feature driver: pcm -> 36-float features one
   10-ms frame per call through the PUBLIC streaming entry point
   lpcnet_compute_single_frame_features (include/lpcnet.h:146,
   src/lpcnet_enc.c:911-933) — the frame-at-a-time contract our
   features.compute_features(mode="single", T=1) must match. */
#include <stdio.h>
#include <stdlib.h>
#include "lpcnet.h"

int main(int argc, char **argv) {
  FILE *fin, *fout;
  LPCNetEncState *enc;
  short pcm[LPCNET_FRAME_SIZE];
  float feat[NB_TOTAL_FEATURES];
  if (argc != 3) {
    fprintf(stderr, "usage: %s in.s16 out.f32\n", argv[0]);
    return 1;
  }
  fin = fopen(argv[1], "rb");
  fout = fopen(argv[2], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  enc = lpcnet_encoder_create();
  while (fread(pcm, sizeof(short), LPCNET_FRAME_SIZE, fin)
         == LPCNET_FRAME_SIZE) {
    lpcnet_compute_single_frame_features(enc, pcm, feat);
    fwrite(feat, sizeof(float), NB_TOTAL_FEATURES, fout);
  }
  lpcnet_encoder_destroy(enc);
  fclose(fin); fclose(fout);
  return 0;
}
