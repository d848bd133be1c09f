#!/bin/bash
set -e
REF=/root/reference/source
OUT=/root/repo/.refbuild
CXXFLAGS="-O1 -I$REF/Lib/TLibDecoder -w -fpermissive -std=gnu++03 -DDEBUG_CABAC_BINS=1 -I$REF/Lib -I$REF/App/TAppDecoder -I$REF"
g++ $CXXFLAGS -c /tmp/TDecBinCoderCABAC_dbg.cpp -o $OUT/objbins/Lib_TLibDecoder_TDecBinCoderCABAC.o
g++ $CXXFLAGS $REF/App/TAppDecoder/*.cpp $OUT/objbins/*.o -o $OUT/TAppDecoderBins2
