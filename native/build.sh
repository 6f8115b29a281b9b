#!/bin/sh
# Build the native helpers next to this script.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -shared -fPIC -pthread -march=native -o libkeccak_v2.so keccak.cpp
echo "built $(pwd)/libkeccak_v2.so"
${CXX:-g++} -O3 -shared -fPIC -o libpairing.so pairing.cpp
echo "built $(pwd)/libpairing.so"
