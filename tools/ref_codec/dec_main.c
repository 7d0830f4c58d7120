/* Reference codec-decoder driver: 8-byte packets -> 4x36 feature frames
   (decode_packet, src/lpcnet_dec.c:81-155; synthesis omitted so the
   decoded features themselves can be compared). */
#include <stdio.h>
#include <string.h>
#include "lpcnet.h"
#include "lpcnet_private.h"

int main(int argc, char **argv) {
  FILE *fin, *fout;
  unsigned char buf[LPCNET_COMPRESSED_SIZE];
  float features[4][NB_TOTAL_FEATURES];
  float vq_mem[NB_BANDS];
  if (argc != 3) {
    fprintf(stderr, "usage: %s in.bin out.f32\n", argv[0]);
    return 1;
  }
  fin = fopen(argv[1], "rb");
  fout = fopen(argv[2], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  memset(vq_mem, 0, sizeof(vq_mem));
  while (fread(buf, 1, LPCNET_COMPRESSED_SIZE, fin)
         == LPCNET_COMPRESSED_SIZE) {
    memset(features, 0, sizeof(features));
    decode_packet(features, vq_mem, buf);
    fwrite(features, sizeof(float), 4 * NB_TOTAL_FEATURES, fout);
  }
  fclose(fin); fclose(fout);
  return 0;
}
