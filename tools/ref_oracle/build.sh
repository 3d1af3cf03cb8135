#!/bin/bash
# Build the reference-oracle binary used by golden tests.
set -e
cd "$(dirname "$0")"
mkdir -p build
SRC="/root/reference"
FLAGS="-O2 -std=c++11 -I$SRC -I$SRC/third_party/butteraugli -w"
OBJS=()
for f in $SRC/guetzli/*.cc; do
  b=$(basename "$f" .cc)
  [ "$b" = "guetzli" ] && continue   # main() needs libpng; we have our own harness
  if [ ! -f build/$b.o ] || [ "$f" -nt build/$b.o ]; then
    g++ $FLAGS -c "$f" -o build/$b.o &
  fi
  OBJS+=(build/$b.o)
done
if [ ! -f build/butteraugli.o ]; then
  g++ $FLAGS -c $SRC/third_party/butteraugli/butteraugli/butteraugli.cc -o build/butteraugli.o &
fi
OBJS+=(build/butteraugli.o)
wait
g++ $FLAGS harness.cc "${OBJS[@]}" -o build/oracle
echo built build/oracle
