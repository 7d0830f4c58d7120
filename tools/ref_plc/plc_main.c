/* PLC-network driver: replicates compute_plc_pred (lpcnet_plc.c:135-145)
   exactly, using the reference nnet.c layer compute. Reads (T, 57) f32
   [burg36|feat20|flag], writes (T, 20) predictions. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "nnet.h"
#include "plc_data.h"

#define MIN16(a,b) ((a)<(b)?(a):(b))
int parse_weights(WeightArray **list, const unsigned char *data, int len);

int init_plc_model(PLCModel *model, const WeightArray *arrays) {
  if (dense_init(&model->plc_dense1, arrays, "plc_dense1_bias",
      "plc_dense1_weights", 57, 128, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->plc_gru1, arrays, "plc_gru1_bias",
      "plc_gru1_subias", "plc_gru1_weights", "plc_gru1_weights_idx",
      "plc_gru1_recurrent_weights", 128, 256, ACTIVATION_TANH, 1)) return 1;
  if (gru_init(&model->plc_gru2, arrays, "plc_gru2_bias",
      "plc_gru2_subias", "plc_gru2_weights", "plc_gru2_weights_idx",
      "plc_gru2_recurrent_weights", 256, 256, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->plc_out, arrays, "plc_out_bias",
      "plc_out_weights", 256, 20, ACTIVATION_LINEAR)) return 1;
  return 0;
}

int main(int argc, char **argv) {
  FILE *fw, *fin, *fout;
  long len;
  unsigned char *data;
  WeightArray *list;
  PLCModel model;
  PLCNetState net;
  float in[57], out[20];
  float zeros[3*PLC_MAX_RNN_NEURONS] = {0};
  float dense_out[PLC_DENSE1_OUT_SIZE];
  if (argc != 4) {
    fprintf(stderr, "usage: %s weights.bin in.f32 out.f32\n", argv[0]);
    return 1;
  }
  fw = fopen(argv[1], "rb");
  if (!fw) { perror(argv[1]); return 1; }
  fseek(fw, 0, SEEK_END); len = ftell(fw); fseek(fw, 0, SEEK_SET);
  data = malloc(len);
  if (fread(data, 1, len, fw) != (size_t)len) return 1;
  fclose(fw);
  if (parse_weights(&list, data, len) < 0) {
    fprintf(stderr, "bad blob\n"); return 1;
  }
  if (init_plc_model(&model, list)) {
    fprintf(stderr, "init failed\n"); return 1;
  }
  memset(&net, 0, sizeof(net));
  fin = fopen(argv[2], "rb");
  fout = fopen(argv[3], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  while (fread(in, sizeof(float), 57, fin) == 57) {
    /* compute_plc_pred, lpcnet_plc.c:135-145 */
    _lpcnet_compute_dense(&model.plc_dense1, dense_out, in);
    compute_gruB(&model.plc_gru1, zeros, net.plc_gru1_state, dense_out);
    compute_gruB(&model.plc_gru2, zeros, net.plc_gru2_state,
                 net.plc_gru1_state);
    _lpcnet_compute_dense(&model.plc_out, out, net.plc_gru2_state);
    out[19] = MIN16(.5f, out[19]+.1f);
    fwrite(out, sizeof(float), 20, fout);
  }
  fclose(fin); fclose(fout);
  return 0;
}
