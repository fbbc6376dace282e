"""Unit tests for the WFST library (juicer_tpu.fst)."""

import io
import math
import random

import pytest

from juicer_tpu.fst import EPSILON, Fst, LOG, TROPICAL, SymbolTable, algos
from juicer_tpu.fst.io import read_fsm, read_symbols, write_fsm, write_symbols
from juicer_tpu.fst.semiring import INF


def linear_fst(labels, weight_each=1.0, sr=TROPICAL):
    f = Fst(sr)
    s = f.add_state()
    f.set_start(s)
    for lab in labels:
        t = f.add_state()
        f.add_arc(s, t, lab, lab, weight_each)
        s = t
    f.set_final(s, 0.5)
    return f


def assert_equivalent(a, b, labels, n=200, seed=0, delta=1e-4, sr=None):
    """Check ⊕-weights of random input strings agree between machines."""
    sr = sr or a.semiring
    rng = random.Random(seed)
    seqs = [il for il, _, _ in algos.generate_sequences(a, n, seed=seed)]
    seqs += [il for il, _, _ in algos.generate_sequences(b, n, seed=seed + 1)]
    seqs += [[rng.choice(labels) for _ in range(rng.randrange(1, 6))] for _ in range(20)]
    checked = 0
    for seq in seqs:
        wa = algos.string_weight(a, seq, sr)
        wb = algos.string_weight(b, seq, sr)
        assert sr.approx_equal(wa, wb, delta), f"seq={seq}: {wa} vs {wb}"
        checked += 1
    assert checked > 0


class TestSymbolTable:
    def test_roundtrip(self):
        t = SymbolTable.with_epsilon()
        t.add("a")
        t.add("#1")
        buf = io.StringIO()
        write_symbols(t, buf)
        buf.seek(0)
        t2 = read_symbols(buf)
        assert t2.find("a") == 1
        assert t2.find("#1") == 2
        assert t2.is_auxiliary(2)
        assert not t2.is_auxiliary(1)
        assert t2.num_aux == 1


class TestIO:
    def test_fsm_roundtrip(self):
        f = Fst(LOG)
        s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 2, 0.25)
        f.add_arc(s1, s2, 3, 0, 0.0)
        f.add_arc(s1, s1, 2, 2, 1.5)
        f.set_final(s2, 0.75)
        buf = io.StringIO()
        write_fsm(f, buf)
        buf.seek(0)
        g = read_fsm(buf, LOG)
        assert g.start == 0
        assert g.num_arcs == 3
        assert g.finals[2] == 0.75
        assert g.num_states == 3

    def test_start_state_written_first(self):
        f = Fst(LOG)
        f.ensure_state(5)
        f.set_start(3)
        f.add_arc(0, 1, 1, 1, 0.0)
        f.add_arc(3, 0, 2, 2, 0.0)
        f.set_final(1)
        buf = io.StringIO()
        write_fsm(f, buf)
        buf.seek(0)
        g = read_fsm(buf)
        assert g.start == 3


class TestBasicOps:
    def test_shortest_path_linear(self):
        f = linear_fst([1, 2, 3])
        cost, il, ol = algos.shortest_path(f)
        assert il == [1, 2, 3]
        assert abs(cost - 3.5) < 1e-9

    def test_shortest_path_choice(self):
        f = Fst(TROPICAL)
        s0, s1 = f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 2.0)
        f.add_arc(s0, s1, 2, 2, 1.0)
        f.set_final(s1, 0.0)
        cost, il, _ = algos.shortest_path(f)
        assert il == [2] and abs(cost - 1.0) < 1e-9

    def test_connect_removes_dead(self):
        f = Fst(TROPICAL)
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s0, s2, 2, 2, 0.0)  # s2 is a dead end
        f.add_arc(s3, s1, 3, 3, 0.0)  # s3 unreachable
        f.set_final(s1)
        g = algos.connect(f)
        assert g.num_states == 2
        assert g.num_arcs == 1

    def test_invert_project(self):
        f = linear_fst([1, 2])
        f.arc_olabel = [5, 6]
        g = algos.invert(f)
        assert g.arc_ilabel == [5, 6]
        assert g.arc_olabel == [1, 2]
        h = algos.project(f, output=True)
        assert h.arc_ilabel == [5, 6]

    def test_closure_accepts_repeats(self):
        f = linear_fst([1], weight_each=2.0)
        g = algos.closure(f)
        assert algos.string_weight(g, [], TROPICAL) == 0.0
        assert abs(algos.string_weight(g, [1], TROPICAL) - 2.5) < 1e-9
        assert abs(algos.string_weight(g, [1, 1], TROPICAL) - 5.0) < 1e-9
        assert algos.string_weight(g, [2], TROPICAL) == INF


class TestCompose:
    def test_simple_match(self):
        a = linear_fst([1, 2])  # il==ol
        b = Fst(TROPICAL)
        s0 = b.add_state()
        b.set_start(s0)
        s1, s2 = b.add_state(), b.add_state()
        b.add_arc(s0, s1, 1, 10, 0.5)
        b.add_arc(s1, s2, 2, 20, 0.5)
        b.set_final(s2, 0.0)
        c = algos.compose(a, b)
        cost, il, ol = algos.shortest_path(c)
        assert il == [1, 2]
        assert ol == [10, 20]
        # a: two arcs (1.0 each) + final 0.5 ; b: two arcs (0.5 each) + final 0
        assert abs(cost - 3.5) < 1e-9

    def test_eps_filter_no_double_count(self):
        # a emits eps output between symbols; b has eps input arcs.
        # In the LOG semiring, a naive eps product would double-count paths.
        sr = LOG
        a = Fst(sr)
        s0, s1, s2 = (a.add_state() for _ in range(3))
        a.set_start(s0)
        a.add_arc(s0, s1, 1, 1, 1.0)
        a.add_arc(s1, s2, 2, EPSILON, 1.0)
        a.set_final(s2, 0.0)
        b = Fst(sr)
        t0, t1, t2 = (b.add_state() for _ in range(3))
        b.set_start(t0)
        b.add_arc(t0, t1, 1, 1, 1.0)
        b.add_arc(t1, t2, EPSILON, 3, 1.0)
        b.set_final(t1, 0.0)
        b.set_final(t2, 0.0)
        c = algos.compose(a, b)
        # input [1,2]: a path weight 2.0; b consumes 1 (w 1.0) then either
        # stops (final t1) or takes eps arc (w 1.0, emits 3).
        w = algos.string_weight(c, [1, 2], sr)
        expect = sr.plus(2.0 + 1.0, 2.0 + 1.0 + 1.0)
        assert sr.approx_equal(w, expect, 1e-6)

    def test_compose_matches_brute_force_weights(self):
        # randomized: compose then compare string weights against manual DP
        rng = random.Random(3)
        sr = LOG
        for trial in range(5):
            a = Fst(sr)
            for _ in range(4):
                a.add_state()
            a.set_start(0)
            for _ in range(8):
                a.add_arc(
                    rng.randrange(4), rng.randrange(4),
                    rng.randrange(1, 3), rng.randrange(0, 3), rng.random()
                )
            a.set_final(3, 0.1)
            b = Fst(sr)
            for _ in range(3):
                b.add_state()
            b.set_start(0)
            for _ in range(6):
                b.add_arc(
                    rng.randrange(3), rng.randrange(3),
                    rng.randrange(0, 3), rng.randrange(1, 3), rng.random()
                )
            b.set_final(2, 0.2)
            c = algos.compose(a, b)
            # weight of input string x through c == sum over mid strings of
            # a(x->y) * b(y->z); verify via projections is complex, so just
            # check c's input weights equal compose-by-definition on samples
            for il, _, _ in algos.generate_sequences(c, 10, seed=trial):
                wc = algos.string_weight(c, il, sr)
                # brute force: all output strings of a for input il (bounded)
                wa_total = sr.zero
                # enumerate paths of a with input il
                def walk(state, pos, w, out):
                    nonlocal wa_total
                    if pos == len(il):
                        fw = a.final_weight(state)
                        if fw != INF:
                            wb = algos.string_weight(b, out, sr)
                            if wb != INF:
                                wa_total = sr.plus(wa_total, w + fw + wb)
                    adj = [i for i in range(a.num_arcs) if a.arc_src[i] == state]
                    for ai in adj:
                        if pos < len(il) and a.arc_ilabel[ai] == il[pos]:
                            nout = out + ([a.arc_olabel[ai]] if a.arc_olabel[ai] != EPSILON else [])
                            walk(a.arc_dst[ai], pos + 1, w + a.arc_weight[ai], nout)
                if len(il) <= 4:
                    walk(a.start, 0, 0.0, [])
                    assert sr.approx_equal(wc, wa_total, 1e-4), (trial, il, wc, wa_total)


class TestDeterminize:
    def test_acceptor_merges_paths(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 1.0)
        f.add_arc(s0, s2, 1, 1, 2.0)
        f.add_arc(s1, s3, 2, 2, 3.0)
        f.add_arc(s2, s3, 2, 2, 1.0)
        f.set_final(s3, 0.0)
        g = algos.determinize(f)
        # deterministic: one arc per (state, ilabel)
        seen = set()
        for i in range(g.num_arcs):
            key = (g.arc_src[i], g.arc_ilabel[i])
            assert key not in seen
            seen.add(key)
        assert_equivalent(f, g, [1, 2], sr=sr)

    def test_log_semiring_sums(self):
        sr = LOG
        f = Fst(sr)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 1.0)
        f.add_arc(s0, s2, 1, 1, 1.0)
        f.set_final(s1, 0.0)
        f.set_final(s2, 0.0)
        g = algos.determinize(f)
        w = algos.string_weight(g, [1], sr)
        assert sr.approx_equal(w, 1.0 - math.log(2.0), 1e-6)

    def test_transducer_residual_strings(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        # same input, different outputs -> delayed output emission
        f.add_arc(s0, s1, 1, 10, 1.0)
        f.add_arc(s0, s2, 1, 20, 1.0)
        f.add_arc(s1, s3, 2, 11, 0.0)
        f.add_arc(s2, s3, 3, 21, 0.0)
        f.set_final(s3, 0.0)
        g = algos.determinize(f)
        # path for input [1,2] must output [10,11]; [1,3] -> [20,21]
        c12 = algos.compose(algos.project(linear_fst([1, 2], 0.0, sr)), g)
        _, _, ol = algos.shortest_path(c12)
        assert ol == [10, 11]
        c13 = algos.compose(algos.project(linear_fst([1, 3], 0.0, sr)), g)
        _, _, ol = algos.shortest_path(c13)
        assert ol == [20, 21]


class TestMinimize:
    def test_merges_equivalent_states(self):
        sr = TROPICAL
        f = Fst(sr)
        # two identical suffix branches that should merge
        s0, a1, a2, b1, b2 = (f.add_state() for _ in range(5))
        f.set_start(s0)
        f.add_arc(s0, a1, 1, 1, 0.0)
        f.add_arc(s0, b1, 2, 2, 0.0)
        f.add_arc(a1, a2, 3, 3, 0.0)
        f.add_arc(b1, b2, 3, 3, 0.0)
        f.set_final(a2, 0.0)
        f.set_final(b2, 0.0)
        g = algos.minimize(f)
        assert g.num_states == 3
        assert_equivalent(f, g, [1, 2, 3], sr=sr)

    def test_weighted_merge_after_push(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, a1, a2, b1, b2 = (f.add_state() for _ in range(5))
        f.set_start(s0)
        # same total path weights but distributed differently
        f.add_arc(s0, a1, 1, 1, 1.0)
        f.add_arc(a1, a2, 3, 3, 2.0)
        f.add_arc(s0, b1, 2, 2, 2.0)
        f.add_arc(b1, b2, 3, 3, 1.0)
        f.set_final(a2, 0.0)
        f.set_final(b2, 0.0)
        g = algos.minimize(f)
        assert g.num_states == 3
        assert_equivalent(f, g, [1, 2, 3], sr=sr)


class TestEpsilon:
    def test_rmepsilon(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, EPSILON, EPSILON, 1.0)
        f.add_arc(s1, s2, 1, 1, 1.0)
        f.set_final(s2, 0.5)
        g = algos.rmepsilon(f)
        for i in range(g.num_arcs):
            assert not (g.arc_ilabel[i] == EPSILON and g.arc_olabel[i] == EPSILON)
        assert abs(algos.string_weight(g, [1], sr) - 2.5) < 1e-9

    def test_epsnormalize_input(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, EPSILON, 7, 1.0)  # input-eps arc WITH output
        f.add_arc(s1, s2, 1, 8, 1.0)
        f.set_final(s2, 0.0)
        g = algos.epsnormalize_input(f)
        # no reachable path should begin with a bare input-eps arc that
        # could instead be fused; outputs and weights must be preserved
        c = algos.compose(algos.project(linear_fst([1], 0.0, sr)), g)
        cost, _, ol = algos.shortest_path(c)
        assert ol == [7, 8]
        # 1.0 + 1.0 from f, plus linear_fst's final weight 0.5
        assert abs(cost - 2.5) < 1e-9

    def test_push_weights_preserves_equivalence(self):
        sr = TROPICAL
        f = Fst(sr)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s1, s2, 2, 2, 5.0)
        f.add_arc(s0, s2, 3, 3, 2.0)
        f.set_final(s2, 1.0)
        g = algos.push_weights(f)
        assert_equivalent(f, g, [1, 2, 3], sr=sr)
        # after pushing, cost concentrates early: first arc of 1-2 path
        # carries the full remaining path cost
        w1 = [g.arc_weight[i] for i in range(g.num_arcs) if g.arc_ilabel[i] == 1][0]
        assert abs(w1 - 6.0) < 1e-6


class TestPipelineShape:
    def test_det_min_pipeline_on_lexicon_like_machine(self):
        """det+min of a union of shared-prefix strings behaves like a trie+suffix sharing."""
        sr = TROPICAL
        words = [[1, 2, 3], [1, 2, 4], [5, 2, 3]]
        m = None
        for w in words:
            f = linear_fst(w, 1.0, sr)
            m = f if m is None else algos.union(m, f)
        m = algos.rmepsilon(m)
        d = algos.determinize(m)
        g = algos.minimize(d)
        for w in words:
            assert algos.string_weight(g, w, sr) != INF
        assert algos.string_weight(g, [1, 2], sr) == INF
        assert g.num_states <= d.num_states
