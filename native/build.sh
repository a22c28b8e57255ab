#!/bin/sh
# Build the native runtime library (C++; no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o libcocircom_native.so keccak.cpp
echo "built native/libcocircom_native.so"
