#!/bin/bash
set -e
REF=/root/reference/source
OUT=/root/repo/.refbuild
CXXFLAGS="-O1 -w -fpermissive -std=gnu++03 -DRExt__ENVIRONMENT_VARIABLE_DEBUG_AND_TEST=1 -DDEBUG_STRING -I$REF/Lib -I$REF/App/TAppDecoder -I$REF"
mkdir -p $OUT/objdbg
for src in $REF/Lib/TLibCommon/*.cpp $REF/Lib/libmd5/*.c $REF/Lib/TLibVideoIO/*.cpp $REF/Lib/TAppCommon/*.cpp $REF/Lib/TLibDecoder/*.cpp; do
  obj=$OUT/objdbg/$(echo "$src" | sed "s|$REF/||; s|/|_|g; s|\.cpp$|.o|; s|\.c$|.o|")
  [ -f "$obj" ] && [ ! "$src" -nt "$obj" ] && continue
  g++ $CXXFLAGS -c "$src" -o "$obj" &
done
wait
g++ $CXXFLAGS $REF/App/TAppDecoder/*.cpp $OUT/objdbg/*.o -o $OUT/TAppDecoderDbg
echo DONE
