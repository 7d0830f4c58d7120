/* Reference-synthesis driver: blob + features.f32 -> pcm
   (lpcnet_demo -synthesis with USE_WEIGHTS_FILE, lpcnet_demo.c:37-78,202-219) */
#include <stdio.h>
#include <stdlib.h>
#include "lpcnet.h"

int main(int argc, char **argv) {
  FILE *fw, *fin, *fout;
  long len;
  unsigned char *data;
  LPCNetState *net;
  float features[NB_TOTAL_FEATURES];
  short pcm[LPCNET_FRAME_SIZE];
  if (argc != 4) {
    fprintf(stderr, "usage: %s weights.bin features.f32 out.pcm\n", argv[0]);
    return 1;
  }
  fw = fopen(argv[1], "rb");
  if (!fw) { perror(argv[1]); return 1; }
  fseek(fw, 0, SEEK_END); len = ftell(fw); fseek(fw, 0, SEEK_SET);
  data = malloc(len);
  if (fread(data, 1, len, fw) != (size_t)len) { perror("read"); return 1; }
  fclose(fw);
  net = lpcnet_create();
  if (lpcnet_load_model(net, data, len)) {
    fprintf(stderr, "weight blob rejected\n");
    return 1;
  }
  fin = fopen(argv[2], "rb");
  fout = fopen(argv[3], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  while (fread(features, sizeof(float), NB_TOTAL_FEATURES, fin)
         == NB_TOTAL_FEATURES) {
    lpcnet_synthesize(net, features, pcm, LPCNET_FRAME_SIZE);
    fwrite(pcm, sizeof(short), LPCNET_FRAME_SIZE, fout);
  }
  fclose(fin); fclose(fout);
  lpcnet_destroy(net);
  free(data);
  return 0;
}
