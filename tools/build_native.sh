#!/bin/sh
# Build the native host-kernel library (ctypes-consumed C ABI).
set -e
cd "$(dirname "$0")/.."
mkdir -p polysolve_tpu/_native
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    cpp/host_kernels.cpp -o polysolve_tpu/_native/libhostkernels.so
echo "built polysolve_tpu/_native/libhostkernels.so"
