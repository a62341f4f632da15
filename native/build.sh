#!/bin/sh
# Build the native TurboRANS host codec -> native/libturbofse.so
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -march=native -fPIC -shared -pthread -Wall -o libturbofse.so turbofse.cc
echo "built $(pwd)/libturbofse.so"
