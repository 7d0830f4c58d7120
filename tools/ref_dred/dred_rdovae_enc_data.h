/* Hand-written equivalent of the generated dred_rdovae_enc_data.h for the
   deployable geometry (cond 256, cond2 256 — the torch trainer's
   defaults; the C's zero_vector[1024] condition buffer bounds GRUs at
   3N <= 1024, so the TF default cond 1024 is NOT C-deployable). */
#ifndef DRED_RDOVAE_ENC_DATA_H
#define DRED_RDOVAE_ENC_DATA_H

#include "nnet.h"

#define ENC_DENSE1_OUT_SIZE 256
#define ENC_DENSE2_OUT_SIZE 256
#define ENC_DENSE2_STATE_SIZE 256
#define ENC_DENSE3_OUT_SIZE 256
#define ENC_DENSE4_OUT_SIZE 256
#define ENC_DENSE4_STATE_SIZE 256
#define ENC_DENSE5_OUT_SIZE 256
#define ENC_DENSE6_OUT_SIZE 256
#define ENC_DENSE6_STATE_SIZE 256
#define ENC_DENSE7_OUT_SIZE 256
#define ENC_DENSE8_OUT_SIZE 256
#define GDENSE1_OUT_SIZE 128
#define GDENSE2_OUT_SIZE 24
#define BITS_DENSE_OUT_SIZE 80
#define BITS_DENSE_STATE_SIZE (2048*3)

struct RDOVAEEnc {
  DenseLayer enc_dense1;
  GRULayer enc_dense2;
  DenseLayer enc_dense3;
  GRULayer enc_dense4;
  DenseLayer enc_dense5;
  GRULayer enc_dense6;
  DenseLayer enc_dense7;
  DenseLayer enc_dense8;
  DenseLayer gdense1;
  DenseLayer gdense2;
  Conv1DLayer bits_dense;
};

int init_rdovae_enc(struct RDOVAEEnc *model, const WeightArray *arrays);

#endif
