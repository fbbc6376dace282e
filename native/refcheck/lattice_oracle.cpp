/* Lattice conformance oracle: the reference's UNMODIFIED basic decoder
 * core (WFSTDecoder.cpp) with lattice generation enabled
 * (doLatticeGeneration=true -> WFSTDecoder::addLatticeEntry,
 * WFSTDecoder.cpp:1320; WFSTLattice::addEntry/writeLatticeFSM,
 * WFSTLattice.cpp:160-240,323), driven by scripted GMM scores.
 *
 * Decodes one utterance and writes the lattice FSM to <lattice.fsm>
 * (the reference format: "from to in out -weight" lines then
 * "state -weight" final lines). stdout prints RESULT <score> or EMPTY
 * so the caller can sanity-check the 1-best survived.
 *
 * Used by tests/test_ref_lattice.py: the weighted OUTPUT-label path
 * language of this lattice is compared against the jtpu engine's
 * lattice (decoder/lattice.py) — structural layouts differ by design
 * (the reference records one arc per transition crossing including
 * every eps hop, keyed per-frame by net to-state; jtpu records one
 * edge per closure crossing keyed by entered arc), but at equal
 * pruning both must encode the same alternative word sequences at the
 * same path scores.
 */

#include <cstdio>
#include <cstdlib>

#include "LogFile.h"
#include "WFSTNetwork.h"
#include "WFSTDecoder.h"
#include "DecHypHistPool.h"
#include "ScriptedModels.h"

using namespace Juicer;

int main(int argc, char** argv)
{
    if (argc != 14)
    {
        fprintf(stderr,
                "usage: %s <fsm> <insyms> <outsyms> <models.bin> "
                "<scores.bin> <lmScale> <insPen> <startBeam> <mainBeam> "
                "<endBeam> <wordBeam> <maxHyps> <lattice.fsm>\n"
                "beams of 0.0 disable the respective window\n",
                argv[0]);
        return 2;
    }
    const char* fsmF = argv[1];
    const char* inSymsF = argv[2];
    const char* outSymsF = argv[3];
    const char* modelsF = argv[4];
    const char* scoresF = argv[5];
    real lmScale = (real)atof(argv[6]);
    real insPen = (real)atof(argv[7]);
    real startBeam = (real)atof(argv[8]);
    real mainBeam = (real)atof(argv[9]);
    real endBeam = (real)atof(argv[10]);
    real wordBeam = (real)atof(argv[11]);
    int maxHyps = atoi(argv[12]);
    const char* latF = argv[13];

    LogFile::open("/dev/null");

    WFSTNetwork* network = new WFSTNetwork(
        fsmF, inSymsF, outSymsF, lmScale, insPen, REMOVEBOTH);

    ScriptedModels* models = new ScriptedModels();
    models->loadScripted(modelsF, scoresF);

    fprintf(stderr,
            "lattice_oracle: nStates=%d nTrans=%d init=%d nHMMs=%d T=%d\n",
            network->getNumStates(), network->getNumTransitions(),
            network->getInitState(), models->getNumHMMs(),
            models->numFrames());

    WFSTDecoder* decoder = new WFSTDecoder(
        network, models, startBeam, mainBeam, endBeam, wordBeam, maxHyps,
        /*doModelLevelOutput=*/false, /*doLatticeGeneration=*/true,
        /*isStaticComposition=*/true);

    // Disable the periodic dead-end cleanup: WFSTLattice::
    // removeDeadEndTransitions reads wfstTrans[0] when nTrans==0 (the
    // partial cleanup fires every 2 frames, before the first model
    // crossing on toy tasks — an out-of-bounds read in the unmodified
    // reference). Dead-end arcs never reach a final state, so they are
    // invisible to the path-language comparison the conformance test
    // performs; the un-trimmed lattice is written directly after the
    // frame loop (finish()'s full removal pass has the same nTrans==0
    // hazard and is likewise skipped).
    decoder->getLattice()->enableDeadEndRemoval(1000000000, 1000000000);

    decoder->init();
    int T = models->numFrames();
    for (int t = 0; t < T; ++t)
        decoder->processFrame(NULL, t, T);

    decoder->getLattice()->writeLatticeFSM(latF);
    printf("DONE\n");
    fflush(stdout);

    delete decoder;
    delete models;
    delete network;
    return 0;
}
