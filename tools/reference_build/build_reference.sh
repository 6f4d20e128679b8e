#!/bin/sh
# Build the reference renderer (/root/reference/ky.cpp) with GCC 12, which
# lacks <format>/<print>: the two clean-room shim headers in this directory
# provide the tiny std::format subset ky.cpp uses, and one MSVC-only line
# (std::exception(const char*), ky.cpp:81) is patched to std::runtime_error
# in a /tmp build copy. The resulting binary renders the TRUE golden images
# for pixel-parity validation (tools/compare_reference.py).
set -e
HERE=$(dirname "$0")
cp /root/reference/ky.cpp /tmp/ky_build.cpp
sed -i 's/throw std::exception(msg.c_str());/throw std::runtime_error(msg);/' /tmp/ky_build.cpp
g++ -std=c++20 -O2 -fopenmp -I"$HERE" -o /tmp/ky_ref /tmp/ky_build.cpp
echo "built /tmp/ky_ref (usage: cd /tmp && ./ky_ref <4*spp>; writes single.bmp)"
