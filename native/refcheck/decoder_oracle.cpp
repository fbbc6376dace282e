/* Conformance oracle runner: the reference's UNMODIFIED WFSTDecoderLite
 * (WFSTDecoderLite.cpp:311-605) driven by scripted GMM scores.
 *
 * Loads an FSM network + a ScriptedModels file pair, decodes one
 * utterance, and prints the 1-best result in a parse-friendly format:
 *
 *   RESULT <score> <acousticScore> <lmScore>
 *   WORD <outLabel> <endFrame> <score> <acousticScore> <lmScore>
 *   ...                                  (first word to last)
 * or
 *   EMPTY
 *
 * Fields mirror DecoderSingleTest::extractResultsFromHypWordMode
 * (DecoderSingleTest.cpp:403-470): WORD lines walk hyp->hist (label,
 * end time, cumulative scores at the word boundary).
 *
 * Built by build.sh with real=double (JTPU_REAL_DOUBLE) so results are
 * comparable at f64 precision against decoder/ref_core.py and the f64
 * TPU engine path (tests/test_ref_decoder.py).
 */

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LogFile.h"
#include "WFSTNetwork.h"
#include "WFSTDecoderLite.h"
#include "DecHypHistPool.h"
#include "ScriptedModels.h"

using namespace Juicer;

namespace
{
    /* Exposes per-frame internals for debugging divergences
     * (JTPU_ORACLE_TRACE=1); the decoding code itself is untouched. */
    class TracedDecoder : public WFSTDecoderLite
    {
    public:
        TracedDecoder(WFSTNetwork* n, IModels* m, real sb, real mb,
                      real eb, real wb, int mh)
            : WFSTDecoderLite(n, m, sb, mb, eb, wb, mh) {}

        void traceFrame(int t) const
        {
            fprintf(stderr,
                    "frame %d: nActiveInsts=%d bestEmit=%g bestFinal=%g "
                    "nPath=%d\n",
                    t, nActiveInsts, (double)bestEmitScore,
                    (double)bestFinalToken.score, nPath);
        }
    };
}

int main(int argc, char** argv)
{
    if (argc != 13)
    {
        fprintf(stderr,
                "usage: %s <fsm> <insyms> <outsyms> <models.bin> "
                "<scores.bin> <lmScale> <insPen> <startBeam> <mainBeam> "
                "<endBeam> <wordBeam> <maxHyps>\n"
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

    // route the decoder's LogFile statistics away from stdout
    LogFile::open("/dev/null");

    WFSTNetwork* network = new WFSTNetwork(
        fsmF, inSymsF, outSymsF, lmScale, insPen, REMOVEBOTH);

    ScriptedModels* models = new ScriptedModels();
    models->loadScripted(modelsF, scoresF);

    fprintf(stderr,
            "oracle: nStates=%d nTrans=%d init=%d nHMMs=%d T=%d\n",
            network->getNumStates(), network->getNumTransitions(),
            network->getInitState(), models->getNumHMMs(),
            models->numFrames());

    TracedDecoder* decoder = new TracedDecoder(
        network, models, startBeam, mainBeam, endBeam, wordBeam, maxHyps);

    bool trace = getenv("JTPU_ORACLE_TRACE") != NULL;
    decoder->recognitionStart();
    if (trace)
        decoder->traceFrame(-1);
    int T = models->numFrames();
    for (int t = 0; t < T; ++t)
    {
        decoder->processFrame(NULL, t, T);
        if (trace)
            decoder->traceFrame(t);
    }
    DecHyp* hyp = decoder->recognitionFinish();

    if (hyp == NULL || DecHypHistPool::isActiveHyp(hyp) == false)
    {
        printf("EMPTY\n");
    }
    else
    {
        printf("RESULT %.12e %.12e %.12e\n",
               (double)hyp->score, (double)hyp->acousticScore,
               (double)hyp->lmScore);
        std::vector<DecHypHist*> hist;
        for (DecHypHist* h = hyp->hist; h != NULL; h = h->prev)
            hist.push_back(h);
        for (int i = (int)hist.size() - 1; i >= 0; --i)
            printf("WORD %d %d %.12e %.12e %.12e\n",
                   hist[i]->state, hist[i]->time, (double)hist[i]->score,
                   (double)hist[i]->acousticScore, (double)hist[i]->lmScore);
    }
    fflush(stdout);

    delete decoder;
    delete models;
    delete network;
    return 0;
}
