#!/bin/sh
# Build libmixkit.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libmixkit.so mixkit.cc
echo "built $(pwd)/libmixkit.so"
