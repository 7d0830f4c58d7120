/* Full reference PLC-engine driver (lpcnet_demo -plc_file equivalent,
   src/lpcnet_demo.c:220-249). Combined LPCNet+PLC weight blob.
   noncausal modes need the FEATURES_DELAY=0 build (build_engine.sh
   noncausal); output is sample-aligned like the demo (skip/extra 80). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "lpcnet.h"

int main(int argc, char **argv) {
  FILE *fw, *ferr, *fin, *fout;
  long len;
  unsigned char *data;
  LPCNetPLCState *net;
  short pcm[LPCNET_FRAME_SIZE];
  int count = 0, loss = 0, flags;
  int skip = 0, extra = 0;
  if (argc != 6) {
    fprintf(stderr,
            "usage: %s causal|causal_dc|noncausal|noncausal_dc "
            "w.bin err.txt in.pcm out.pcm\n",
            argv[0]);
    return 1;
  }
  if (!strncmp(argv[1], "noncausal", 9)) {
    flags = LPCNET_PLC_NONCAUSAL;
    if (argv[1][9] == '_') flags |= LPCNET_PLC_DC_FILTER;
    skip = extra = 80;          /* lpcnet_demo.c:226 */
  } else {
    flags = LPCNET_PLC_CAUSAL;
    if (argv[1][6] == '_') flags |= LPCNET_PLC_DC_FILTER;
  }
  fw = fopen(argv[2], "rb");
  if (!fw) { perror(argv[2]); return 1; }
  fseek(fw, 0, SEEK_END); len = ftell(fw); fseek(fw, 0, SEEK_SET);
  data = malloc(len);
  if (fread(data, 1, len, fw) != (size_t)len) return 1;
  fclose(fw);
  net = lpcnet_plc_create(flags);
  if (lpcnet_plc_load_model(net, data, len)) {
    fprintf(stderr, "blob rejected\n");
    return 1;
  }
  ferr = fopen(argv[3], "r");
  fin = fopen(argv[4], "rb");
  fout = fopen(argv[5], "wb");
  if (!ferr || !fin || !fout) { perror("io"); return 1; }
  while (fread(pcm, sizeof(short), LPCNET_FRAME_SIZE, fin)
         == LPCNET_FRAME_SIZE) {
    if (count % 2 == 0) {
      if (fscanf(ferr, "%d", &loss) != 1) loss = 0;
    }
    if (loss) lpcnet_plc_conceal(net, pcm);
    else lpcnet_plc_update(net, pcm);
    fwrite(&pcm[skip], sizeof(short), LPCNET_FRAME_SIZE - skip, fout);
    skip = 0;
    count++;
  }
  if (extra) {                  /* flush the delay line, lpcnet_demo.c:245 */
    lpcnet_plc_conceal(net, pcm);
    fwrite(pcm, sizeof(short), extra, fout);
  }
  lpcnet_plc_destroy(net);
  return 0;
}
