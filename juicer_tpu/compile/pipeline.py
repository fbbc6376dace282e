"""CLG composition pipeline.

Python rebuild of `/root/reference/bin/build-wfst-openfst:99-180` (log
semiring throughout), with no external FST toolkit:

  G:   arcsort, determinize
  L:   arcsort, closure
  C:   arcsort, connect, invert, determinize, encode-minimize-decode, invert
  LG:  compose(L', G'), epsnormalize, determinize, encode-minimize-decode,
       arcsort, then (default) map auxiliary input symbols to epsilon
       (`bin/aux2eps.pl`)
  CLG: compose(C', LG), push weights -> final.fsm (+ C insyms / G outsyms)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..fst import EPSILON, Fst, SymbolTable, algos


def aux_to_eps(f: Fst, isyms: SymbolTable) -> Fst:
    """Replace auxiliary ('#...') input labels with epsilon
    (`bin/aux2eps.pl:1-80`)."""
    g = f.copy()
    g.arc_ilabel = [
        EPSILON if (il > 0 and il < len(isyms) and isyms.is_auxiliary(il)) else il
        for il in g.arc_ilabel
    ]
    return g


@dataclass
class CLGResult:
    clg: Fst
    lg: Fst
    in_syms: SymbolTable  # model (HMM) symbols, from C
    out_syms: SymbolTable  # word symbols, from G


def build_clg(
    g_fst: Fst,
    l_fst: Fst,
    c_fst: Fst,
    optimize_final: bool = False,
    remove_aux: bool = True,
) -> CLGResult:
    # Prepare G: determinize (eps/backoff labels treated as regular symbols)
    g = algos.determinize(algos.arcsort(g_fst))
    # Prepare L: closure
    l = algos.closure(algos.arcsort(l_fst))
    # Prepare C: connect, invert, determinize, minimize (encoded), invert
    c = algos.arcsort(c_fst)
    c = algos.connect(c)
    c = algos.invert(c)
    c = algos.determinize(c)
    c = algos.minimize(c)
    c = algos.invert(c)

    # LG
    lg = algos.compose(l, g)
    lg = algos.epsnormalize_input(lg)
    lg = algos.determinize(lg)
    lg = algos.minimize(lg)
    lg = algos.arcsort(lg)
    if not optimize_final and remove_aux and l_fst.isyms is not None:
        lg = aux_to_eps(lg, l_fst.isyms)

    # CLG
    clg = algos.compose(c, lg)
    if optimize_final:
        clg = algos.epsnormalize_input(clg)
        clg = algos.determinize(clg)
        clg = algos.minimize(clg)
    clg = algos.push_weights(clg)
    clg.isyms = c_fst.isyms
    clg.osyms = g_fst.osyms
    return CLGResult(clg=clg, lg=lg, in_syms=c_fst.isyms, out_syms=g_fst.osyms)
