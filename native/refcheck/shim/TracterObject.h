/* Minimal stand-in for Tracter's `Object` base class, just enough to
 * compile the reference's `WFSTDecoderLite` (which inherits it only for
 * env-var configuration: `GetEnv("MaxAllocModels", 10)` etc.,
 * WFSTDecoderLite.cpp:48,73,117) as a conformance oracle binary.
 *
 * Env lookups mirror Tracter's convention (ObjectName_Param); none are
 * set in the test harness, so the reference defaults always apply. */

#ifndef TRACTER_OBJECT_SHIM_H
#define TRACTER_OBJECT_SHIM_H

#include <cstdlib>
#include <cstdio>
#include <string>

namespace Tracter
{
    class Object
    {
    public:
        virtual ~Object() {}

    protected:
        const char* mObjectName;

        Object() : mObjectName("Object") {}

        const char* lookup(const char* name) const
        {
            std::string var = std::string(mObjectName) + "_" + name;
            return getenv(var.c_str());
        }

        int GetEnv(const char* name, int def) const
        {
            const char* v = lookup(name);
            return v ? atoi(v) : def;
        }

        float GetEnv(const char* name, float def) const
        {
            const char* v = lookup(name);
            return v ? (float)atof(v) : def;
        }

        const char* GetEnv(const char* name, const char* def) const
        {
            const char* v = lookup(name);
            return v ? v : def;
        }

        void Verbose(int, const char*, ...) const {}
    };
}

#endif
