/* Scripted-score IModels for the decoder conformance oracle.
 *
 * Same trick as HTKModels_shim.cpp used for cdgen: the reference's
 * UNMODIFIED `WFSTDecoderLite` only touches models through the IModels
 * interface (Models.h), so an implementation that serves precomputed
 * GMM log-likelihoods from a file lets us run the real decoder without
 * Torch3/Tracter/HTK features.
 *
 * trP / SEIndex / teeLogProb reproduce `HTKModels::createTrPandSEIndex`
 * (HTKModels.cpp:2330-2391): dense (n,n) log matrices with LOG_ZERO for
 * absent transitions; SEIndex[j] = contiguous predecessor range, the
 * tee transition (0 -> n-1) excluded; teeLogProb = trP[0][n-1].
 *
 * models.bin (little-endian):
 *   int32 magic 0x4A54504D ("JTPM")  int32 nHMMs  int32 nGmms
 *   per HMM: int32 nStates
 *            float64[nStates*nStates] log transP row-major
 *                    (values <= -1e29 mean "no transition")
 *            int32[nStates-2] gmm index per emitting state
 * scores.bin:
 *   int32 magic 0x4A545053 ("JTPS")  int32 T  int32 nGmms
 *   float64[T*nGmms] log-likelihoods, frame-major
 */

#ifndef JTPU_SCRIPTED_MODELS_H
#define JTPU_SCRIPTED_MODELS_H

#include <vector>
#include "Models.h"

namespace Juicer
{
    class ScriptedModels : public IModels
    {
    public:
        ScriptedModels();
        virtual ~ScriptedModels();

        void loadScripted(const char* modelsFName, const char* scoresFName);
        int numFrames() const { return T_; }

        // -- IModels --------------------------------------------------
        void Load(const char*, const char*, int);
        void Load(const char*, bool removeInitialToFinalTransitions_ = false);
        void readBinary(const char*);
        void output(const char*, bool);
        void newFrame(int frame, real** input, int nFrames);
        void setBlockSize(int);

        real calcOutput(int hmmInd, int stateInd);
        real calcOutput(int gmmInd);

        int getNumHMMs() { return nHMMs_; }
        int getCurrFrame() { return currFrame_; }
        const char* getHMMName(int hmmInd);
        int getInputVecSize() { return 1; }

        int getNumStates(int hmmInd) { return nStates_[hmmInd]; }
        int getNumSuccessors(int, int);
        int getSuccessor(int, int, int);
        real getSuccessorLogProb(int, int, int);
        real getTeeLogProb(int hmmInd);
        real** getTransMat(int hmmInd) { return trP_[hmmInd]; }
        SEIndex* getSEIndex(int hmmInd) { return se_[hmmInd]; }

    private:
        int nHMMs_;
        int nGmms_;
        int T_;
        int currFrame_;
        std::vector<int> nStates_;
        std::vector<real**> trP_;               // per-HMM dense (n,n)
        std::vector<SEIndex*> se_;              // per-HMM, indexed 1..n-1
        std::vector<std::vector<int> > gmmInd_; // per-HMM emitting states
        std::vector<real> scores_;              // (T, nGmms) frame-major
        std::vector<char> names_;
    };
}

#endif
