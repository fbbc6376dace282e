/* Minimal Torch3 `CmdLine` stand-in (see general.h): exactly the API the
 * reference's offline tools use — addText + S/B/I/R options + read().
 * Torch3 semantics: string/int/real options consume one value argument;
 * bool options are presence flags that flip the default. */

#ifndef TORCH_CMDLINE_SHIM_H
#define TORCH_CMDLINE_SHIM_H

#include "general.h"
#include <vector>
#include <string>

namespace Torch {

class CmdLine
{
    struct Opt {
        std::string name;
        char type;  // 's' | 'b' | 'i' | 'r'
        void *ptr;
        bool b_init;
    };
    std::vector<Opt> opts;

    Opt *find(const char *name)
    {
        for (auto &o : opts)
            if (o.name == name) return &o;
        return NULL;
    }

public:
    void addText(const char *) {}
    void info(const char *) {}

    void addSCmdOption(const char *name, char **ptr, const char *init,
                       const char *, bool = false)
    {
        *ptr = strdup(init);
        opts.push_back(Opt{name, 's', (void *)ptr, false});
    }
    void addBCmdOption(const char *name, bool *ptr, bool init,
                       const char *, bool = false)
    {
        *ptr = init;
        opts.push_back(Opt{name, 'b', (void *)ptr, init});
    }
    void addICmdOption(const char *name, int *ptr, int init,
                       const char *, bool = false)
    {
        *ptr = init;
        opts.push_back(Opt{name, 'i', (void *)ptr, false});
    }
    void addRCmdOption(const char *name, real *ptr, real init,
                       const char *, bool = false)
    {
        *ptr = init;
        opts.push_back(Opt{name, 'r', (void *)ptr, false});
    }

    void read(int argc, char *argv[])
    {
        for (int i = 1; i < argc; i++) {
            Opt *o = find(argv[i]);
            if (!o)
                error("CmdLine::read - unknown option %s", argv[i]);
            if (o->type == 'b') {
                *(bool *)o->ptr = !o->b_init;
                continue;
            }
            if (++i >= argc)
                error("CmdLine::read - missing value for %s", argv[i - 1]);
            switch (o->type) {
            case 's':
                *(char **)o->ptr = strdup(argv[i]);
                break;
            case 'i':
                *(int *)o->ptr = atoi(argv[i]);
                break;
            case 'r':
                *(real *)o->ptr = (real)atof(argv[i]);
                break;
            }
        }
    }
};

}

#endif
