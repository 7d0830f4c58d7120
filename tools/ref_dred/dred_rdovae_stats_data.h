/* stub: entropy-model tables unused by the parity driver */
#ifndef DRED_RDOVAE_STATS_DATA_H
#define DRED_RDOVAE_STATS_DATA_H
#include "opus_types.h"
static const opus_uint16 dred_p0_q15[80] = {0};
static const opus_uint16 dred_quant_scales_q8[80] = {0};
static const opus_uint16 dred_dead_zone_q10[80] = {0};
static const opus_uint16 dred_r_q15[80] = {0};
#endif
