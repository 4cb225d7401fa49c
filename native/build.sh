#!/bin/sh
# Build the native IO runtime into the package tree. Idempotent; callers
# (io_utils/volume.py) fall back to pure numpy when the .so is absent.
set -e
cd "$(dirname "$0")"
INC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
OUT=../gpufluidsimulation_tpu/native
mkdir -p "$OUT"
touch "$OUT/__init__.py"
cc -O3 -shared -fPIC -I"$INC" "$OUT/gfs_io.c" -o "$OUT/gfs_io.so" -lpthread
echo "built $OUT/gfs_io.so"
