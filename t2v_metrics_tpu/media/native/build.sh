#!/bin/sh
# Build libt2vmedia.so (JPEG batch decode + libav video/audio decode).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -fPIC -shared -std=c++17 -o libt2vmedia.so t2vmedia.cc \
    -ljpeg -lpng -lavformat -lavcodec -lavutil -lswscale -lswresample -lpthread
echo "built $(pwd)/libt2vmedia.so"
