/* lpcnet.c's lpcnet_decode references decode_packet (codec, unused here) */
void decode_packet(float f[4][36], float *m, const unsigned char b[8])
{ (void)f; (void)m; (void)b; }
