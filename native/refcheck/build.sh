#!/bin/sh
# Build the REFERENCE's offline WFST tools (gramgen / lexgen) against the
# minimal Torch3 shim in shim/, for arc-level cross-checking of the
# jtpu-* rebuilds (tests/test_ref_toolchain.py). The decoder binary
# itself needs Torch3+Tracter and is not buildable here; these tools'
# only external dependency is Torch3's CmdLine/general/log_add surface.
#
# Usage: build.sh <outdir>
set -e
OUT=${1:?usage: build.sh outdir}
REF=${REF_SRC:-/root/reference/src}
HERE=$(dirname "$0")
mkdir -p "$OUT"

CXX=${CXX:-g++}
FLAGS="-O1 -w -I$HERE/shim -I$REF -std=c++11"

common="$REF/DecVocabulary.cpp $REF/MonophoneLookup.cpp $REF/LogFile.cpp \
        $REF/string_stuff.cpp"

$CXX $FLAGS -o "$OUT/gramgen" "$REF/gramgen.cpp" \
    $common "$REF/ARPALM.cpp" "$REF/WFSTGramGen.cpp" "$REF/WordPairLM.cpp" \
    "$REF/WFSTNetwork.cpp"

$CXX $FLAGS -o "$OUT/lexgen" "$REF/lexgen.cpp" \
    $common "$REF/DecLexInfo.cpp" "$REF/DecPhoneInfo.cpp" \
    "$REF/WFSTLexGen.cpp"

# cdgen: the real WFSTCDGen + a name-list HTKModels shim (the generated
# FSM depends on models only through getHMMName; htkparse needs
# flex/bison which this image lacks)
$CXX $FLAGS -o "$OUT/cdgen" "$REF/cdgen.cpp" \
    $common "$REF/WFSTCDGen.cpp" "$REF/WFSTNetwork.cpp" \
    "$HERE/shim/HTKModels_shim.cpp"

echo "built: $OUT/gramgen $OUT/lexgen $OUT/cdgen"
