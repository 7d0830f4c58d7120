/* stub: synthesis-only build, no DRED */
#ifndef DRED_RDOVAE_CONSTANTS_H
#define DRED_RDOVAE_CONSTANTS_H
#define DRED_MAX_RNN_NEURONS 1
#define DRED_MAX_CONV_INPUTS 1
#endif
