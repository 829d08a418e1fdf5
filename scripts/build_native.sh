#!/bin/sh
# Build the native host-pipeline library (C++ -> libv2ap_native.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 \
    v2ap_tpu/native/v2ap_native.cpp \
    -o v2ap_tpu/native/libv2ap_native.so
echo "built v2ap_tpu/native/libv2ap_native.so"
