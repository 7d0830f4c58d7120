/* Gate-level probe for the DOT_PROD GRU numerics: loads a weight blob,
   then per step reads input[1152] + cond[48] floats, runs
   compute_sparse_gru (GRU-A) and compute_gruB (GRU-B), and writes both
   post-step states. Isolates nnet.c:326-448 + vec.h:206-340 from the AR
   loop so the emulation (kernels/sample_dotprod.py) can be compared
   per step. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "nnet.h"
#include "nnet_data.h"

int init_lpcnet_model(LPCNetModel *model, const WeightArray *arrays);
int parse_weights(WeightArray **list, const unsigned char *data, int len);

int main(int argc, char **argv) {
  FILE *fw, *fin, *fout;
  long len;
  unsigned char *data;
  WeightArray *arrays;
  LPCNetModel model;
  float gru_a_state[GRU_A_STATE_SIZE] = {0};
  float gru_b_state[GRU_B_STATE_SIZE] = {0};
  float input[3 * GRU_A_STATE_SIZE];
  float cond[3 * GRU_B_STATE_SIZE];
  if (argc != 4) {
    fprintf(stderr, "usage: %s weights.bin in.f32 out.f32\n", argv[0]);
    return 1;
  }
  fw = fopen(argv[1], "rb");
  if (!fw) { perror(argv[1]); return 1; }
  fseek(fw, 0, SEEK_END); len = ftell(fw); fseek(fw, 0, SEEK_SET);
  data = malloc(len);
  if (fread(data, 1, len, fw) != (size_t)len) { perror("read"); return 1; }
  fclose(fw);
  if (parse_weights(&arrays, data, len) < 0) {
    fprintf(stderr, "blob rejected\n"); return 1;
  }
  if (init_lpcnet_model(&model, arrays)) {
    fprintf(stderr, "init failed\n"); return 1;
  }
  fin = fopen(argv[2], "rb");
  fout = fopen(argv[3], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  while (fread(input, sizeof(float), 3 * GRU_A_STATE_SIZE, fin)
             == 3 * GRU_A_STATE_SIZE &&
         fread(cond, sizeof(float), 3 * GRU_B_STATE_SIZE, fin)
             == 3 * GRU_B_STATE_SIZE) {
    compute_sparse_gru(&model.sparse_gru_a, gru_a_state, input);
    compute_gruB(&model.gru_b, cond, gru_b_state, gru_a_state);
    fwrite(gru_a_state, sizeof(float), GRU_A_STATE_SIZE, fout);
    fwrite(gru_b_state, sizeof(float), GRU_B_STATE_SIZE, fout);
  }
  fclose(fin); fclose(fout);
  free(arrays); free(data);
  return 0;
}
