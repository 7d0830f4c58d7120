/* DRED RDO-VAE parity driver: encode dframes / decode qframes with the
   reference dred_rdovae_enc.c/dec.c, weights from an export_ref blob.
   modes:
     enc weights.bin in_pairs.f32(T,40) lat.f32(T,80) state.f32(T,24)
     dec weights.bin state.f32(24) lat.f32(S,80) out.f32(S,80)      */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "nnet.h"
#include "dred_rdovae.h"
#include "dred_rdovae_enc.h"
#include "dred_rdovae_dec.h"

int parse_weights(WeightArray **list, const unsigned char *data, int len);

int init_rdovae_enc(struct RDOVAEEnc *m, const WeightArray *a) {
  if (dense_init(&m->enc_dense1, a, "enc_dense1_bias", "enc_dense1_weights",
      40, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->enc_dense2, a, "enc_dense2_bias", "enc_dense2_subias",
      "enc_dense2_weights", "enc_dense2_weights_idx",
      "enc_dense2_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->enc_dense3, a, "enc_dense3_bias", "enc_dense3_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->enc_dense4, a, "enc_dense4_bias", "enc_dense4_subias",
      "enc_dense4_weights", "enc_dense4_weights_idx",
      "enc_dense4_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->enc_dense5, a, "enc_dense5_bias", "enc_dense5_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->enc_dense6, a, "enc_dense6_bias", "enc_dense6_subias",
      "enc_dense6_weights", "enc_dense6_weights_idx",
      "enc_dense6_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->enc_dense7, a, "enc_dense7_bias", "enc_dense7_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->enc_dense8, a, "enc_dense8_bias", "enc_dense8_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->gdense1, a, "gdense1_bias", "gdense1_weights",
      2048, 128, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->gdense2, a, "gdense2_bias", "gdense2_weights",
      128, 24, ACTIVATION_TANH)) return 1;
  if (conv1d_init(&m->bits_dense, a, "bits_dense_bias",
      "bits_dense_weights", 2048, 4, 80, ACTIVATION_LINEAR)) return 1;
  return 0;
}

int init_rdovae_dec(struct RDOVAEDec *m, const WeightArray *a) {
  if (dense_init(&m->dec_dense1, a, "dec_dense1_bias", "dec_dense1_weights",
      80, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->dec_dense2, a, "dec_dense2_bias", "dec_dense2_subias",
      "dec_dense2_weights", "dec_dense2_weights_idx",
      "dec_dense2_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->dec_dense3, a, "dec_dense3_bias", "dec_dense3_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->dec_dense4, a, "dec_dense4_bias", "dec_dense4_subias",
      "dec_dense4_weights", "dec_dense4_weights_idx",
      "dec_dense4_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->dec_dense5, a, "dec_dense5_bias", "dec_dense5_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (gru_init(&m->dec_dense6, a, "dec_dense6_bias", "dec_dense6_subias",
      "dec_dense6_weights", "dec_dense6_weights_idx",
      "dec_dense6_recurrent_weights", 256, 256, ACTIVATION_TANH, 1))
    return 1;
  if (dense_init(&m->dec_dense7, a, "dec_dense7_bias", "dec_dense7_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->dec_dense8, a, "dec_dense8_bias", "dec_dense8_weights",
      256, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->dec_final, a, "dec_final_bias", "dec_final_weights",
      2048, 80, ACTIVATION_LINEAR)) return 1;
  if (dense_init(&m->state1, a, "state1_bias", "state1_weights",
      24, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->state2, a, "state2_bias", "state2_weights",
      24, 256, ACTIVATION_TANH)) return 1;
  if (dense_init(&m->state3, a, "state3_bias", "state3_weights",
      24, 256, ACTIVATION_TANH)) return 1;
  return 0;
}

static unsigned char *read_all(const char *path, long *len) {
  FILE *f = fopen(path, "rb");
  unsigned char *d;
  if (!f) { perror(path); exit(1); }
  fseek(f, 0, SEEK_END); *len = ftell(f); fseek(f, 0, SEEK_SET);
  d = malloc(*len);
  if (fread(d, 1, *len, f) != (size_t)*len) exit(1);
  fclose(f);
  return d;
}

int main(int argc, char **argv) {
  long len;
  unsigned char *data;
  WeightArray *list;
  if (argc < 3) { fprintf(stderr, "usage: %s enc|dec|stats ...\n", argv[0]);
                  return 1; }
  if (!strcmp(argv[1], "stats")) {
    /* stats out.bin n_entries: dump the q8/q10/q15 entropy-model tables
       through the reference accessors (dred_rdovae.c:118-136); only
       meaningful when built against generated dred_rdovae_stats_data. */
    int n;
    FILE *f;
    if (argc < 4) { fprintf(stderr, "usage: %s stats out.bin n_entries\n",
                            argv[0]); return 1; }
    n = atoi(argv[3]);
    f = fopen(argv[2], "wb");
    if (!f) { perror(argv[2]); return 1; }
    fwrite(DRED_rdovae_get_quant_scales_pointer(), sizeof(opus_uint16), n, f);
    fwrite(DRED_rdovae_get_dead_zone_pointer(), sizeof(opus_uint16), n, f);
    fwrite(DRED_rdovae_get_r_pointer(), sizeof(opus_uint16), n, f);
    fwrite(DRED_rdovae_get_p0_pointer(), sizeof(opus_uint16), n, f);
    fclose(f);
    return 0;
  }
  if (argc < 6) { fprintf(stderr, "usage: %s enc|dec blob.bin in out1 out2\n",
                          argv[0]); return 1; }
  data = read_all(argv[2], &len);
  if (parse_weights(&list, data, len) < 0) {
    fprintf(stderr, "bad blob\n"); return 1;
  }
  if (!strcmp(argv[1], "enc")) {
    struct RDOVAEEnc model;
    RDOVAEEncState st;
    float in[40], lat[80], state[24];
    FILE *fin = fopen(argv[3], "rb");
    FILE *flat = fopen(argv[4], "wb");
    FILE *fst = fopen(argv[5], "wb");
    if (!fin || !flat || !fst) { perror("enc open"); return 1; }
    if (init_rdovae_enc(&model, list)) {
      fprintf(stderr, "enc init failed\n"); return 1; }
    memset(&st, 0, sizeof(st));
    while (fread(in, sizeof(float), 40, fin) == 40) {
      dred_rdovae_encode_dframe(&st, &model, lat, state, in);
      fwrite(lat, sizeof(float), 80, flat);
      fwrite(state, sizeof(float), 24, fst);
    }
  } else {
    struct RDOVAEDec model;
    RDOVAEDecState st;
    float state[24], lat[80], out[80];
    FILE *fst = fopen(argv[3], "rb");
    FILE *flat = fopen(argv[4], "rb");
    FILE *fout = fopen(argv[5], "wb");
    if (!fst || !flat || !fout) { perror("dec open"); return 1; }
    if (init_rdovae_dec(&model, list)) {
      fprintf(stderr, "dec init failed\n"); return 1; }
    memset(&st, 0, sizeof(st));
    if (fread(state, sizeof(float), 24, fst) != 24) return 1;
    dred_rdovae_dec_init_states(&st, &model, state);
    while (fread(lat, sizeof(float), 80, flat) == 80) {
      dred_rdovae_decode_qframe(&st, &model, out, lat);
      fwrite(out, sizeof(float), 80, fout);
    }
  }
  return 0;
}
