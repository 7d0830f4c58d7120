/* Injected-conditions sample-rate engine driver: the reference's hot loop
   (lpcnet_synthesize_tail_impl, lpcnet.c:235-271 + run_sample_network,
   lpcnet.c:146-167) replicated call-for-call on top of the reference's
   own nnet.c/kiss99.c/common.h, but with the per-frame conditioning
   (gru_a_condition[1152], gru_b_condition[48], lpc[16]) read from a file
   instead of computed by run_frame_network. This isolates the QUANTIZED
   sample network (the DOT_PROD vec.h kernels) from the float frame
   network, whose XLA-vs-C accumulation-order ulps otherwise get amplified
   by the activation quantizer's floor(.5+127x) boundaries into trajectory
   forks (see kernels/sample_dotprod.py docstring).

   Input file layout per frame: 1152 + 48 + 16 floats. Output: 160 int16
   samples per frame. KISS99 seeded "LPCNet", logit table as in
   lpcnet_init (lpcnet.c:188-191). */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "nnet.h"
#include "nnet_data.h"
#include "common.h"
#include "kiss99.h"

#define PREEMPH 0.85f
#define LPC_ORDER 16
#define FRAME_SIZE 160

int init_lpcnet_model(LPCNetModel *model, const WeightArray *arrays);
int parse_weights(WeightArray **list, const unsigned char *data, int len);

int main(int argc, char **argv) {
  FILE *fw, *fin, *fout;
  long len;
  unsigned char *data;
  WeightArray *arrays;
  LPCNetModel model;
  NNetState net;
  kiss99_ctx rng;
  float sampling_logit_table[256];
  float last_sig[LPC_ORDER] = {0};
  float deemph_mem = 0;
  int last_exc;
  float cond_a[3 * GRU_A_STATE_SIZE], cond_b[3 * GRU_B_STATE_SIZE];
  float lpc[LPC_ORDER];
  short output[FRAME_SIZE];
  int i, j;
  const char *rng_string = "LPCNet";

  FILE *fdbg = NULL;
  if (argc != 4 && argc != 5) {
    fprintf(stderr, "usage: %s weights.bin conds.f32 out.pcm [dbg.f32]\n",
            argv[0]);
    return 1;
  }
  if (argc == 5) fdbg = fopen(argv[4], "wb");
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
  /* lpcnet_init (lpcnet.c:188-191) + lpcnet_reset (lpcnet.c:174-182) */
  for (i = 0; i < 256; i++) {
    float prob = .025f + .95f * i / 255.f;
    sampling_logit_table[i] = -log((1 - prob) / prob);
  }
  memset(&net, 0, sizeof(net));
  last_exc = lin2ulaw(0.f);
  kiss99_srand(&rng, (const unsigned char *)rng_string,
               strlen(rng_string));

  fin = fopen(argv[2], "rb");
  fout = fopen(argv[3], "wb");
  if (!fin || !fout) { perror("io"); return 1; }
  while (fread(cond_a, sizeof(float), 3 * GRU_A_STATE_SIZE, fin)
             == 3 * GRU_A_STATE_SIZE &&
         fread(cond_b, sizeof(float), 3 * GRU_B_STATE_SIZE, fin)
             == 3 * GRU_B_STATE_SIZE &&
         fread(lpc, sizeof(float), LPC_ORDER, fin) == LPC_ORDER) {
    /* lpcnet_synthesize_tail_impl body (lpcnet.c:244-270), preload=0 */
    for (i = 0; i < FRAME_SIZE; i++) {
      float pcm;
      int exc;
      int last_sig_ulaw, pred_ulaw;
      float pred = 0;
      float gru_a_input[3 * GRU_A_STATE_SIZE];
      float in_b[GRU_A_STATE_SIZE];
      float gru_b_input[3 * GRU_B_STATE_SIZE];
      for (j = 0; j < LPC_ORDER; j++) pred -= last_sig[j] * lpc[j];
      last_sig_ulaw = lin2ulaw(last_sig[0]);
      pred_ulaw = lin2ulaw(pred);
      /* run_sample_network (lpcnet.c:146-167) */
      compute_gru_a_input(gru_a_input, cond_a, GRU_A_STATE_SIZE,
                          &model.gru_a_embed_sig, last_sig_ulaw,
                          &model.gru_a_embed_pred, pred_ulaw,
                          &model.gru_a_embed_exc, last_exc);
      compute_sparse_gru(&model.sparse_gru_a, net.gru_a_state,
                         gru_a_input);
      RNN_COPY(in_b, net.gru_a_state, GRU_A_STATE_SIZE);
      RNN_COPY(gru_b_input, cond_b, 3 * GRU_B_STATE_SIZE);
      compute_gruB(&model.gru_b, gru_b_input, net.gru_b_state, in_b);
      exc = sample_mdense(&model.dual_fc, net.gru_b_state,
                          sampling_logit_table, &rng);
      if (fdbg) {
        float hdr[4];
        hdr[0] = pred; hdr[1] = (float)last_sig_ulaw;
        hdr[2] = (float)pred_ulaw; hdr[3] = (float)exc;
        fwrite(hdr, sizeof(float), 4, fdbg);
        fwrite(net.gru_a_state, sizeof(float), GRU_A_STATE_SIZE, fdbg);
        fwrite(net.gru_b_state, sizeof(float), GRU_B_STATE_SIZE, fdbg);
      }
      pcm = pred + ulaw2lin(exc);
      RNN_MOVE(&last_sig[1], &last_sig[0], LPC_ORDER - 1);
      last_sig[0] = pcm;
      last_exc = exc;
      pcm += PREEMPH * deemph_mem;
      deemph_mem = pcm;
      if (pcm < -32767) pcm = -32767;
      if (pcm > 32767) pcm = 32767;
      output[i] = (int)floor(.5 + pcm);
    }
    fwrite(output, sizeof(short), FRAME_SIZE, fout);
  }
  fclose(fin); fclose(fout);
  if (fdbg) fclose(fdbg);
  free(arrays); free(data);
  return 0;
}
