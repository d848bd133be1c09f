#!/bin/bash
# Build HM reference apps out-of-tree (objects+bins under /root/repo/.refbuild).
set -e
REF=/root/reference/source
OUT=/root/repo/.refbuild
CXX=g++
CXXFLAGS="-O2 -w -fpermissive -std=gnu++03 -I$REF/Lib -I$REF/App/TAppEncoder -I$REF/App/TAppDecoder -I$REF"
mkdir -p $OUT/obj

compile() {
  local src=$1
  local obj=$OUT/obj/$(echo "$src" | sed "s|$REF/||; s|/|_|g; s|\.cpp$|.o|; s|\.c$|.o|")
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CC $src"
    $CXX $CXXFLAGS -c "$src" -o "$obj" &
  fi
}

for src in $REF/Lib/TLibCommon/*.cpp $REF/Lib/libmd5/*.c $REF/Lib/TLibVideoIO/*.cpp $REF/Lib/TAppCommon/*.cpp $REF/Lib/TLibDecoder/*.cpp $REF/Lib/TLibEncoder/*.cpp; do
  compile "$src"
done
wait

$CXX $CXXFLAGS $REF/App/TAppDecoder/*.cpp $OUT/obj/Lib_TLibCommon_*.o $OUT/obj/Lib_libmd5_*.o $OUT/obj/Lib_TLibVideoIO_*.o $OUT/obj/Lib_TAppCommon_*.o $OUT/obj/Lib_TLibDecoder_*.o -o $OUT/TAppDecoder
$CXX $CXXFLAGS $REF/App/TAppEncoder/*.cpp $OUT/obj/Lib_TLibCommon_*.o $OUT/obj/Lib_libmd5_*.o $OUT/obj/Lib_TLibVideoIO_*.o $OUT/obj/Lib_TAppCommon_*.o $OUT/obj/Lib_TLibEncoder_*.o -o $OUT/TAppEncoder
echo DONE
