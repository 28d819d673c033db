#!/bin/sh
# Build the native helpers into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -fopenmp -shared -fPIC raytrace.cpp -o lib/libraytrace.so
echo "built lib/libraytrace.so"
