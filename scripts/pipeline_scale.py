"""Measure the pure-Python FST pipeline (compose/determinize/minimize) at
increasing lexicon/LM sizes — documents the practical scale bound of the
no-external-toolkit path (the reference offloads to OpenFst/AT&T,
`bin/build-wfst-openfst:99-180`; the WSJ L∘G is 2.85M arcs).

Usage: python scripts/pipeline_scale.py [n_words ...]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from juicer_tpu.fst import algos
from juicer_tpu.lexicon import Lexicon
from juicer_tpu.compile import GramGen, GramType, LexGen


PHONES = [f"p{i}" for i in range(40)] + ["sil"]


def synth_task(tmp, n_words, seed=0):
    rng = random.Random(seed)
    lex_lines = []
    for w in range(n_words):
        pron = " ".join(rng.choice(PHONES[:-1])
                        for _ in range(rng.randint(2, 8)))
        lex_lines.append(f"w{w} {pron}")
    lexf = os.path.join(tmp, "lex.dict")
    phf = os.path.join(tmp, "phones.lst")
    open(lexf, "w").write("\n".join(lex_lines) + "\n")
    open(phf, "w").write("\n".join(PHONES) + "\n")
    lex = Lexicon.load(phf, lexf, sil_phone="sil")
    # bigram ARPA with n_words unigrams + 3x random bigrams
    lmf = os.path.join(tmp, "lm.arpa")
    bigrams = set()
    while len(bigrams) < 3 * n_words:
        bigrams.add((rng.randrange(n_words), rng.randrange(n_words)))
    with open(lmf, "w") as f:
        f.write(f"\\data\\\nngram 1={n_words}\nngram 2={len(bigrams)}\n\n")
        f.write("\\1-grams:\n")
        for w in range(n_words):
            f.write(f"-{1 + rng.random():.4f} w{w} -0.30103\n")
        f.write("\n\\2-grams:\n")
        for a, b in sorted(bigrams):
            f.write(f"-{rng.random():.4f} w{a} w{b}\n")
        f.write("\n\\end\\\n")
    return lex, lmf


def main():
    import tempfile

    sizes = [int(a) for a in sys.argv[1:]] or [200, 1000, 5000]
    for n_words in sizes:
        with tempfile.TemporaryDirectory() as tmp:
            lex, lmf = synth_task(tmp, n_words)
            def stage(name, fn):
                t0 = time.time()
                r = fn()
                dt = time.time() - t0
                print(f"  [{n_words}] {name}: {dt:.1f}s", flush=True)
                return r, dt

            (GL, t_build) = stage("build G+L", lambda: (
                GramGen(lex.vocab, GramType.NGRAM, lm_fname=lmf).build(),
                LexGen(lex).build(output_aux_phones=True)))
            G, L = GL
            # the blessed LG sequence (compile/pipeline.py build_clg)
            (lg, t_compose) = stage("detG+closeL+compose", lambda: algos.compose(
                algos.closure(algos.arcsort(L)),
                algos.determinize(algos.arcsort(G))))
            (lg2, t_eps) = stage("epsnormalize", lambda: algos.epsnormalize_input(lg))
            (det, t_det) = stage("determinize", lambda: algos.determinize(lg2))
            t_det += t_eps
            (mini, t_min) = stage("minimize", lambda: algos.minimize(det))
            print(
                f"n_words={n_words}: L={L.num_arcs} G={G.num_arcs} "
                f"LG={lg.num_arcs} det={det.num_arcs} min={mini.num_arcs} "
                f"arcs | build {t_build:.1f}s compose {t_compose:.1f}s "
                f"epsnorm+determinize {t_det:.1f}s minimize {t_min:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
