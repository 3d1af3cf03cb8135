#!/bin/bash
# Builds the native host runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -fPIC -shared -o libgtpu_host.so host_runtime.cc
echo built "$(pwd)/libgtpu_host.so"
