#!/bin/bash
# Build the native decode/resize library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 decoder.cpp \
    -lpng -ljpeg -lz -lpthread \
    -o libnqa_decoder.so
echo "built $(pwd)/libnqa_decoder.so"
