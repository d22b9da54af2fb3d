#!/bin/sh
# Build and run the native kernels under ThreadSanitizer. The kernels use a
# plain std::thread pool (no OpenMP), so TSAN instruments all synchronization
# and a report here is a real race.
set -e
HERE=$(dirname "$0")
SRC="$HERE/../neural_admixture_tpu/native"
OUT=$(mktemp -d)
g++ -O1 -g -pthread -fsanitize=thread -std=c++17 \
    "$SRC/bed_decode.cpp" "$SRC/tsan_test.cpp" -o "$OUT/tsan_test"
TSAN_OPTIONS="halt_on_error=1" "$OUT/tsan_test"
echo "TSAN: no data races detected"
