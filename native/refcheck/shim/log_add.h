/* Minimal Torch3 `log_add.h` stand-in (see general.h). LOG_ZERO matches
 * Torch3's float build; the offline tools use it only as a sentinel. */

#ifndef TORCH_LOG_ADD_SHIM_H
#define TORCH_LOG_ADD_SHIM_H

#include "general.h"

#define LOG_ZERO (-3.4e+37f)
#define LOG_ONE (0.0f)
#define LOG_2_PI (1.83787706640934548355f)

#ifdef __cplusplus
inline real log_add(real a, real b)
{
    if (a < b) { real t = a; a = b; b = t; }
    if (b <= LOG_ZERO) return a;
    return a + log1pf(expf(b - a));
}

inline real logAdd(real a, real b) { return log_add(a, b); }

namespace Torch {
using ::log_add;
}
#endif

#endif
