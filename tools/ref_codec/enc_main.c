/* Reference codec-encoder driver: pcm -> 8-byte packets
   (lpcnet_demo -encode, src/lpcnet_demo.c:163-175). Codebooks are
   compiled in from codebooks.c (exported by our vq-train). */
#include <stdio.h>
#include <stdlib.h>
#include "lpcnet.h"

int main(int argc, char **argv) {
  FILE *fin, *fout;
  LPCNetEncState *enc;
  short pcm[LPCNET_PACKET_SAMPLES];
  unsigned char buf[LPCNET_COMPRESSED_SIZE];
  if (argc != 3) {
    fprintf(stderr, "usage: %s in.pcm out.bin\n", argv[0]);
    return 1;
  }
  fin = fopen(argv[1], "rb");
  fout = fopen(argv[2], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  enc = lpcnet_encoder_create();
  while (fread(pcm, sizeof(short), LPCNET_PACKET_SAMPLES, fin)
         == LPCNET_PACKET_SAMPLES) {
    lpcnet_encode(enc, pcm, buf);
    fwrite(buf, 1, LPCNET_COMPRESSED_SIZE, fout);
  }
  lpcnet_encoder_destroy(enc);
  fclose(fin); fclose(fout);
  return 0;
}
