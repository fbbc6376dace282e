/* See ScriptedModels.h. */

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdint.h>

#include <log_add.h>
#include "ScriptedModels.h"

namespace Juicer
{

static void readExact(FILE* fd, void* buf, size_t n, const char* what)
{
    if (fread(buf, 1, n, fd) != n)
        error("ScriptedModels: short read (%s)", what);
}

static int32_t readI32(FILE* fd, const char* what)
{
    int32_t v;
    readExact(fd, &v, sizeof(v), what);
    return v;
}

static double readF64(FILE* fd, const char* what)
{
    double v;
    readExact(fd, &v, sizeof(v), what);
    return v;
}

ScriptedModels::ScriptedModels()
    : nHMMs_(0), nGmms_(0), T_(0), currFrame_(-1)
{
}

ScriptedModels::~ScriptedModels()
{
    for (size_t i = 0; i < trP_.size(); ++i)
    {
        if (trP_[i])
        {
            delete[] trP_[i][0];
            delete[] trP_[i];
        }
        if (se_[i])
            delete[] (se_[i] + 1); // stored from index 1
    }
}

void ScriptedModels::loadScripted(
    const char* modelsFName, const char* scoresFName)
{
    FILE* fd = fopen(modelsFName, "rb");
    if (!fd)
        error("ScriptedModels: cannot open %s", modelsFName);
    if (readI32(fd, "magic") != 0x4A54504D)
        error("ScriptedModels: bad models magic");
    nHMMs_ = readI32(fd, "nHMMs");
    nGmms_ = readI32(fd, "nGmms");
    nStates_.resize(nHMMs_);
    trP_.resize(nHMMs_, (real**)NULL);
    se_.resize(nHMMs_, (SEIndex*)NULL);
    gmmInd_.resize(nHMMs_);
    for (int h = 0; h < nHMMs_; ++h)
    {
        int n = readI32(fd, "nStates");
        if (n < 3)
            error("ScriptedModels: nStates < 3");
        nStates_[h] = n;

        // dense trP with LOG_ZERO for absent transitions
        // (HTKModels::createTrPandSEIndex, HTKModels.cpp:2349-2365)
        real* flat = new real[n * n];
        real** trP = new real*[n];
        for (int i = 0; i < n; ++i)
            trP[i] = flat + i * n;
        for (int i = 0; i < n * n; ++i)
        {
            double v = readF64(fd, "transP");
            flat[i] = (v <= -1e29) ? LOG_ZERO : (real)v;
        }
        trP_[h] = trP;

        // SEIndex: contiguous predecessor range per state 1..n-1,
        // tee transition excluded (HTKModels.cpp:2369-2388)
        SEIndex* se = new SEIndex[n - 1];
        --se; // index from 1
        for (int j = 1; j < n; ++j)
        {
            int min, max;
            for (min = (j == n - 1 ? 1 : 0); min < n - 1; ++min)
                if (trP[min][j] > LOG_ZERO)
                    break;
            for (max = n - 1; max >= 1; --max)
                if (trP[max][j] > LOG_ZERO)
                    break;
            se[j].start = (short)min;
            se[j].end = (short)(max + 1);
        }
        se_[h] = se;

        gmmInd_[h].resize(n - 2);
        for (int j = 0; j < n - 2; ++j)
        {
            int g = readI32(fd, "gmmInd");
            if (g < 0 || g >= nGmms_)
                error("ScriptedModels: gmm index out of range");
            gmmInd_[h][j] = g;
        }
    }
    fclose(fd);

    fd = fopen(scoresFName, "rb");
    if (!fd)
        error("ScriptedModels: cannot open %s", scoresFName);
    if (readI32(fd, "magic") != 0x4A545053)
        error("ScriptedModels: bad scores magic");
    T_ = readI32(fd, "T");
    int ng = readI32(fd, "nGmms");
    if (ng != nGmms_)
        error("ScriptedModels: scores/models nGmms mismatch");
    scores_.resize((size_t)T_ * nGmms_);
    for (size_t i = 0; i < scores_.size(); ++i)
        scores_[i] = (real)readF64(fd, "score");
    fclose(fd);
}

void ScriptedModels::Load(const char*, const char*, int)
{
    error("ScriptedModels::Load(phones) not supported");
}

void ScriptedModels::Load(const char*, bool)
{
    error("ScriptedModels::Load(mmf) not supported");
}

void ScriptedModels::readBinary(const char*)
{
    error("ScriptedModels::readBinary not supported");
}

void ScriptedModels::output(const char*, bool)
{
    error("ScriptedModels::output not supported");
}

void ScriptedModels::newFrame(int frame, real**, int)
{
    if (frame < 0 || frame >= T_)
        error("ScriptedModels::newFrame out of range (%d/%d)", frame, T_);
    currFrame_ = frame;
}

void ScriptedModels::setBlockSize(int) {}

real ScriptedModels::calcOutput(int hmmInd, int stateInd)
{
    return calcOutput(gmmInd_[hmmInd][stateInd - 1]);
}

real ScriptedModels::calcOutput(int gmmInd)
{
    return scores_[(size_t)currFrame_ * nGmms_ + gmmInd];
}

const char* ScriptedModels::getHMMName(int hmmInd)
{
    static char buf[32];
    snprintf(buf, sizeof(buf), "hmm%d", hmmInd);
    return buf;
}

/* Successor lists, derived from the dense trP exactly as HTK order
 * lists them (ascending state index; HTKModels keeps the MMF's own
 * lists, which are ascending, and createTrPandSEIndex round-trips
 * them through trP). The basic core (WFSTDecoder/WFSTModel) iterates
 * these; the Lite core uses trP/SEIndex instead. */
int ScriptedModels::getNumSuccessors(int hmmInd, int stateInd)
{
    int n = nStates_[hmmInd];
    int cnt = 0;
    for (int k = 0; k < n; ++k)
        if (trP_[hmmInd][stateInd][k] > LOG_ZERO)
            ++cnt;
    return cnt;
}

int ScriptedModels::getSuccessor(int hmmInd, int stateInd, int sucInd)
{
    int n = nStates_[hmmInd];
    int cnt = 0;
    for (int k = 0; k < n; ++k)
        if (trP_[hmmInd][stateInd][k] > LOG_ZERO)
            if (cnt++ == sucInd)
                return k;
    error("ScriptedModels::getSuccessor out of range");
    return 0;
}

real ScriptedModels::getSuccessorLogProb(int hmmInd, int stateInd, int sucInd)
{
    return trP_[hmmInd][stateInd][getSuccessor(hmmInd, stateInd, sucInd)];
}

real ScriptedModels::getTeeLogProb(int hmmInd)
{
    int n = nStates_[hmmInd];
    return trP_[hmmInd][0][n - 1];
}

}
