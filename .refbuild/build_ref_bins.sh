#!/bin/bash
set -e
REF=/root/reference/source
OUT=/root/repo/.refbuild
CXX=g++
CXXFLAGS="-O1 -w -fpermissive -std=gnu++03 -DDEBUG_CABAC_BINS=1 -I$REF/Lib -I$REF/App/TAppDecoder -I$REF"
mkdir -p $OUT/objbins
for src in $REF/Lib/TLibCommon/*.cpp $REF/Lib/libmd5/*.c $REF/Lib/TLibVideoIO/*.cpp $REF/Lib/TAppCommon/*.cpp $REF/Lib/TLibDecoder/*.cpp; do
  obj=$OUT/objbins/$(echo "$src" | sed "s|$REF/||; s|/|_|g; s|\.cpp$|.o|; s|\.c$|.o|")
  [ -f "$obj" ] && [ ! "$src" -nt "$obj" ] && continue
  $CXX $CXXFLAGS -c "$src" -o "$obj" &
done
wait
$CXX $CXXFLAGS $REF/App/TAppDecoder/*.cpp $OUT/objbins/*.o -o $OUT/TAppDecoderBins
echo DONE
