#!/bin/sh
# Build the reference .fec reader (training_tf2/fec_packets.c) with a
# harness main that dumps every rate + subframe for parity checks.
set -e
REF=${1:-/root/reference}
HERE=$(dirname "$0")
OUT=${2:-$(mktemp -d)}
gcc -O2 -I$REF/training_tf2 \
  $REF/training_tf2/fec_packets.c "$HERE"/fec_main.c \
  -o "$OUT"/ref_fec_read
echo "$OUT"/ref_fec_read
