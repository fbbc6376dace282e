"""Unit tests for the lattice verification utilities
(decoder/lattice.py: shortest_path / contains_cost) used by the
reference-scale lattice run (scripts/wsj_bench.py --lattice)."""

import numpy as np
import pytest

from juicer_tpu.decoder.lattice import contains_cost, shortest_path
from juicer_tpu.fst import EPSILON, Fst, LOG


def diamond():
    """start -> {a(1)/b(3)} -> mid -> c(2) -> final(0.5); plus an eps
    shortcut start->mid at 5."""
    f = Fst(LOG)
    s, m, e = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s)
    f.add_arc(s, m, 1, 1, 1.0)   # out a, cost 1
    f.add_arc(s, m, 2, 2, 3.0)   # out b, cost 3
    f.add_arc(s, m, 0, EPSILON, 5.0)
    f.add_arc(m, e, 3, 3, 2.0)   # out c
    f.set_final(e, 0.5)
    return f


def test_shortest_path():
    cost, labels = shortest_path(diamond())
    assert labels == [1, 3]
    assert abs(cost - 3.5) < 1e-12


def test_contains_cost():
    f = diamond()
    assert abs(contains_cost(f, [1, 3]) - 3.5) < 1e-12
    assert abs(contains_cost(f, [2, 3]) - 5.5) < 1e-12
    # the eps shortcut path emits only c
    assert abs(contains_cost(f, [3]) - 7.5) < 1e-12
    assert not np.isfinite(contains_cost(f, [3, 1]))
    assert not np.isfinite(contains_cost(f, []))


def test_contains_repeated_labels():
    f = Fst(LOG)
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, s1, 1, 7, 1.0)
    f.add_arc(s1, s2, 1, 7, 1.0)
    f.add_arc(s0, s2, 1, 7, 4.0)  # shortcut emits only one 7
    f.set_final(s2, 0.0)
    assert abs(contains_cost(f, [7, 7]) - 2.0) < 1e-12
    assert abs(contains_cost(f, [7]) - 4.0) < 1e-12


def test_cycle_detection():
    f = Fst(LOG)
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, s1, 1, 1, 1.0)
    f.add_arc(s1, s0, 1, 2, 1.0)
    f.set_final(s1, 0.0)
    with pytest.raises(ValueError):
        shortest_path(f)
