/* zero codebooks: the PLC engine's feature path never quantizes */
float ceps_codebook1[1024*17];
float ceps_codebook2[1024*17];
float ceps_codebook3[1024*17];
float ceps_codebook_diff4[4096*18];
