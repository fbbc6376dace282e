#!/bin/sh
# Build the REFERENCE's offline WFST tools (gramgen / lexgen / cdgen)
# AND its runtime decoder core (WFSTDecoderLite) against the minimal
# Torch3/Tracter shims in shim/, for cross-checking the jtpu rebuilds
# (tests/test_ref_toolchain.py, tests/test_ref_decoder.py). The decoder
# needs only Models.h (served by ScriptedModels_shim) and a trivial
# Tracter::Object (TracterObject.h shim), so the full juicer frontend
# stack is not required.
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

# decoder_oracle: the real WFSTDecoderLite token-passing core, driven by
# scripted GMM scores (ScriptedModels). USE_DOUBLE_SCORE is the
# reference's own score_t toggle (src/Makefile.am:24) — token/path
# scores accumulate in double, so they compare tightly against the f64
# python oracle (tests/test_ref_decoder.py); inputs are f32-rounded on
# the python side so both decoders consume bit-identical values.
# OPT_SINGLE_BEST is left off: ref_core.py transcribes the
# #ifndef OPT_SINGLE_BEST branch (separate best-start/best-end beams).
$CXX $FLAGS -DUSE_DOUBLE_SCORE -o "$OUT/decoder_oracle" \
    "$HERE/decoder_oracle.cpp" \
    "$REF/WFSTDecoderLite.cpp" "$REF/WFSTNetwork.cpp" \
    "$REF/DecHypHistPool.cpp" "$REF/BlockMemPool.cpp" \
    "$REF/Histogram.cpp" "$REF/WFSTLattice.cpp" \
    "$REF/LogFile.cpp" "$REF/string_stuff.cpp" \
    "$HERE/shim/ScriptedModels.cpp"

# lattice_oracle: the real BASIC decoder core (WFSTDecoder.cpp) with
# doLatticeGeneration=true, for lattice-content conformance
# (tests/test_ref_lattice.py). Same scripted-score shim; WFSTModel.cpp
# provides WFSTModelPool.
$CXX $FLAGS -DUSE_DOUBLE_SCORE -o "$OUT/lattice_oracle" \
    "$HERE/lattice_oracle.cpp" \
    "$REF/WFSTDecoder.cpp" "$REF/WFSTModel.cpp" "$REF/WFSTNetwork.cpp" \
    "$REF/DecHypHistPool.cpp" "$REF/BlockMemPool.cpp" \
    "$REF/Histogram.cpp" "$REF/WFSTLattice.cpp" \
    "$REF/LogFile.cpp" "$REF/string_stuff.cpp" \
    "$HERE/shim/ScriptedModels.cpp"

echo "built: $OUT/gramgen $OUT/lexgen $OUT/cdgen $OUT/decoder_oracle $OUT/lattice_oracle"
