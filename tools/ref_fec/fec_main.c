/* Harness main around the ACTUAL reference .fec reader
 * (/root/reference/training_tf2/fec_packets.c:33-123).
 *
 * Usage: ref_fec_read in.fec out.bin
 *
 * Reads the int16 header itself (the reference API does not expose it),
 * then exercises get_fec_rate()/get_fec_frame() for every packet and
 * subframe, writing:
 *   int32 num_packets, int32 subframes_per_packet, int32 num_features,
 *   then per packet: int32 rate, float32 features[subframes][num_features]
 *     in SUBFRAME-INDEX order (i.e. the stored, time-flipped order the C
 *     reader hands to the PLC app).
 */
#include <stdio.h>
#include <stdlib.h>
#include <inttypes.h>

#include "fec_packets.h"

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s in.fec out.bin\n", argv[0]);
        return 2;
    }
    int16_t hdr[7];
    FILE *fid = fopen(argv[1], "rb");
    if (!fid || fread(hdr, sizeof(int16_t), 7, fid) != 7) {
        fprintf(stderr, "cannot read header\n");
        return 1;
    }
    fclose(fid);
    int32_t num_packets = hdr[2];
    int32_t subframes = hdr[5];
    int32_t num_features = hdr[6];

    FILE *out = fopen(argv[2], "wb");
    fwrite(&num_packets, sizeof(int32_t), 1, out);
    fwrite(&subframes, sizeof(int32_t), 1, out);
    fwrite(&num_features, sizeof(int32_t), 1, out);
    float *features = malloc(sizeof(float) * num_features);
    for (int p = 0; p < num_packets; p++) {
        int32_t rate = get_fec_rate(argv[1], p);
        if (rate < 0) { fprintf(stderr, "rate fail p=%d\n", p); return 1; }
        fwrite(&rate, sizeof(int32_t), 1, out);
        for (int s = 0; s < subframes; s++) {
            if (get_fec_frame(argv[1], features, p, s)) {
                fprintf(stderr, "frame fail p=%d s=%d\n", p, s);
                return 1;
            }
            fwrite(features, sizeof(float), num_features, out);
        }
    }
    free(features);
    fclose(out);
    return 0;
}
