#!/bin/sh
# Build the hostio native library (see native/hostio.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libhostio.so hostio.cpp -lz -pthread
echo "built $(pwd)/libhostio.so"
