/* Minimal HTKModels stand-in for building the reference's cdgen without
 * flex/bison (htkparse is generated code that cannot be regenerated in
 * this environment). WFSTCDGen uses models ONLY as a name list —
 * getNumHMMs()/getHMMName(i) (WFSTCDGen.cpp:276-308,385) — so the FSM
 * output being cross-checked never depends on means/variances: this shim
 * fills hMMs[].name from `~h "name"` macros in the MMF (or from the
 * phones list in hybrid mode) and stubs the scoring surface. */

#include "HTKModels.h"
#include <ctype.h>

using namespace Juicer;

HTKModels::HTKModels()
{
    currFrame = -1;
    currInput = NULL;
    vecSize = 0;
    nMeanVecs = nMeanVecsAlloc = 0;
    meanVecs = NULL;
    nVarVecs = nVarVecsAlloc = 0;
    varVecs = NULL;
    removeInitialToFinalTransitions = false;
    nTransMats = nTransMatsAlloc = 0;
    transMats = NULL;
    nMixtures = nMixturesAlloc = 0;
    mixtures = NULL;
    nGMMs = nGMMsAlloc = 0;
    gMMs = NULL;
    currGMMOutputs = NULL;
    nHMMs = nHMMsAlloc = 0;
    hMMs = NULL;
    inFD = outFD = NULL;
    fromBinFile = false;
    hybridMode = false;
    logPriors = NULL;
}

HTKModels::~HTKModels()
{
    for (int i = 0; i < nHMMs; i++)
        free(hMMs[i].name);
    free(hMMs);
}

static void addName(HMM *&hmms, int &n, int &alloc, const char *name)
{
    if (n == alloc) {
        alloc += 1024;
        hmms = (HMM *)realloc(hmms, alloc * sizeof(HMM));
    }
    memset(hmms + n, 0, sizeof(HMM));
    hmms[n].name = strdup(name);
    n++;
}

void HTKModels::Load(const char *phonesListFName, const char *priorsFName,
                     int statesPerModel)
{
    /* hybrid HMM/ANN mode: one model per phones-list line */
    (void)priorsFName;
    (void)statesPerModel;
    FILE *fd = fopen(phonesListFName, "r");
    if (fd == NULL)
        error("HTKModels shim - cannot open phones list %s", phonesListFName);
    char line[1024];
    while (fgets(line, sizeof(line), fd) != NULL) {
        char *p = line;
        while (*p && isspace((unsigned char)*p))
            p++;
        char *e = p;
        while (*e && !isspace((unsigned char)*e))
            e++;
        *e = '\0';
        if (*p)
            addName(hMMs, nHMMs, nHMMsAlloc, p);
    }
    fclose(fd);
    hybridMode = true;
}

void HTKModels::Load(const char *htkModelsFName,
                     bool removeInitialToFinalTransitions_)
{
    removeInitialToFinalTransitions = removeInitialToFinalTransitions_;
    FILE *fd = fopen(htkModelsFName, "r");
    if (fd == NULL)
        error("HTKModels shim - cannot open MMF %s", htkModelsFName);
    char line[4096], name[2048];
    while (fgets(line, sizeof(line), fd) != NULL) {
        char *p = line;
        while (*p && isspace((unsigned char)*p))
            p++;
        if (p[0] != '~' || p[1] != 'h')
            continue;
        p += 2;
        while (*p && *p != '"')
            p++;
        if (*p != '"')
            continue;
        p++;
        int i = 0;
        while (*p && *p != '"' && i < (int)sizeof(name) - 1)
            name[i++] = *p++;
        name[i] = '\0';
        if (i)
            addName(hMMs, nHMMs, nHMMsAlloc, name);
    }
    fclose(fd);
}

void HTKModels::readBinary(const char *)
{
    error("HTKModels shim - readBinary not supported");
}
void HTKModels::output(const char *, bool)
{
    error("HTKModels shim - output not supported");
}
void HTKModels::outputStats(FILE *) {}
void HTKModels::newFrame(int, real **, int)
{
    error("HTKModels shim - scoring not supported");
}
void HTKModels::setBlockSize(int) {}
real HTKModels::calcOutput(int, int)
{
    error("HTKModels shim - scoring not supported");
    return 0;
}
real HTKModels::calcOutput(int)
{
    error("HTKModels shim - scoring not supported");
    return 0;
}
