/* Minimal Torch3 `general.h` stand-in, just enough to build the
 * reference's OFFLINE tools (gramgen/lexgen/cdgen) for arc-level
 * cross-checking against the jtpu-* rebuilds (SURVEY.md §4: "the
 * conformance oracle is the reference binary itself").
 *
 * The real Torch3 header also defines Object/Allocator/XFile machinery;
 * none of the offline-tool translation units use any of it — only the
 * `real` typedef and the error/warning/message printers. */

#ifndef TORCH_GENERAL_SHIM_H
#define TORCH_GENERAL_SHIM_H

#include <stdio.h>
#include <stdlib.h>
#include <stdarg.h>
#include <string.h>
#include <math.h>
#include <time.h>
#include <unistd.h>

/* Torch3 default build: real = float (the reference's CMakeLists only
 * overrides Token.score to double inside WFSTDecoderLite, not `real` —
 * and IDecoder::processFrame hardcodes float**, so real must stay
 * float; the decoder oracle instead builds with -DUSE_DOUBLE_SCORE,
 * the reference's own score_t toggle). */
typedef float real;

#ifdef __cplusplus
inline void error(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    fprintf(stderr, "ERROR: ");
    vfprintf(stderr, fmt, ap);
    fprintf(stderr, "\n");
    va_end(ap);
    exit(1);
}

inline void warning(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    fprintf(stderr, "WARNING: ");
    vfprintf(stderr, fmt, ap);
    fprintf(stderr, "\n");
    va_end(ap);
}

inline void message(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stdout, fmt, ap);
    fprintf(stdout, "\n");
    va_end(ap);
}

/* the sources do `using namespace Torch;` */
namespace Torch {
using ::real;
using ::error;
using ::warning;
using ::message;
}
#endif

#endif
