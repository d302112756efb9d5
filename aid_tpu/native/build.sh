#!/bin/sh
# Build the native audio I/O library (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libaudioio.so audioio.cpp flac.cpp -ldl
echo "built $(pwd)/libaudioio.so"
