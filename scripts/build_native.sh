#!/bin/sh
# Build the native runtime library -> native/libdimo_native.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    native/dimo_native.cpp -o native/libdimo_native.so
echo "built native/libdimo_native.so"
