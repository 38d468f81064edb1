#!/bin/bash
# Build the native host kernels into liblfr_native.so (next to this script).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 -o liblfr_native.so lfr_native.cc
echo "built $(pwd)/liblfr_native.so"
