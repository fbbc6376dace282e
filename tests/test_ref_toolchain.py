"""Cross-check the rebuilt offline toolchain against the REAL reference
tools, built from `/root/reference/src` with the minimal Torch3 shim in
`native/refcheck/` (SURVEY.md §4: "the conformance oracle is the
reference binary itself"; §7 step 1: validate generated FSMs against
reference outputs arc-for-arc).

The comparison is BYTE-EXACT — same arcs, same emission order, same
state numbering, same symbol files (including the reference's
`#sil`/`#sp` output-symbol quirk, `WFSTLexGen.cpp:566`).

Skips when the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess
import sys

import pytest

REF_SRC = os.environ.get("JTPU_REF_SRC", "/root/reference/src")
BUILD_SH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "refcheck", "build.sh",
)

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_SRC) and shutil.which("g++")),
    reason="reference sources or g++ unavailable",
)


@pytest.fixture(scope="module")
def refbin(tmp_path_factory):
    out = tmp_path_factory.mktemp("refbin")
    r = subprocess.run(["sh", BUILD_SH, str(out)], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference tool build failed: {r.stderr[-500:]}")
    return out


def _write_mmf(path, names):
    with open(path, "w") as f:
        f.write("~o <VecSize> 4 <MFCC> <DiagC>\n")
        for p in names:
            f.write(f'~h "{p}"\n<BeginHMM>\n<NumStates> 5\n')
            for s in (2, 3, 4):
                f.write(
                    f"<State> {s}\n<Mean> 4\n0.0 0.0 0.0 0.0\n"
                    "<Variance> 4\n1.0 1.0 1.0 1.0\n"
                )
            f.write(
                "<TransP> 5\n"
                "0.0 1.0 0.0 0.0 0.0\n0.0 0.5 0.5 0.0 0.0\n"
                "0.0 0.0 0.5 0.5 0.0\n0.0 0.0 0.0 0.5 0.5\n"
                "0.0 0.0 0.0 0.0 0.0\n<EndHMM>\n"
            )


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    td = tmp_path_factory.mktemp("fix")
    (td / "lex.dict").write_text(
        "a(1.0) ah\ncat k ae t\ndog d ao g\nad ah d\n<s> sil\n</s> sil\n"
    )
    (td / "phones.lst").write_text("ah\nk\nae\nt\nd\nao\ng\nsil\nsp\n")
    phones = ["ah", "k", "ae", "t", "d", "ao", "g", "sil", "sp"]
    _write_mmf(td / "mono.mmf", phones)
    (td / "tied.mono").write_text("\n".join(phones) + "\n")
    # cross-word triphone system over a tiny alphabet {a, b} + CI sil/sp
    (td / "phones3.lst").write_text("a\nb\nsil\nsp\n")
    tri = ["sil", "sp"]
    for c in ("a", "b"):
        for l in ("a", "b", "sil"):
            for r in ("a", "b", "sil"):
                tri.append(f"{l}-{c}+{r}")
    _write_mmf(td / "tri.mmf", tri)
    ties = []
    for c in ("a", "b"):
        for l in ("a", "b", "sil"):
            ties.append(f"{l}-{c}+sp {l}-{c}+sil")
        for r in ("a", "b", "sil"):
            ties.append(f"sp-{c}+{r} sil-{c}+{r}")
    (td / "tied.tri").write_text("\n".join(tri) + "\n" + "\n".join(ties) + "\n")
    (td / "lm.arpa").write_text(
        "\\data\\\nngram 1=6\nngram 2=4\n\n\\1-grams:\n"
        "-0.60206 </s>\n-99 <s> -0.30103\n-0.47712 a -0.30103\n"
        "-0.60206 cat -0.30103\n-0.69897 dog -0.30103\n-0.79897 ad -0.30103\n"
        "\n\\2-grams:\n-0.30103 <s> a\n-0.47712 a cat\n"
        "-0.39794 cat dog\n-0.30103 cat </s>\n\n\\end\\\n"
    )
    return td


def _run_pair(refbin, fixtures, tmp_path, tool, args):
    """Run reference <tool> and jtpu-<tool> with identical flags; assert
    all three outputs (fsm, insyms, outsyms) are byte-identical."""
    outs = {}
    for tag, cmd in (
        ("ref", [str(refbin / tool)]),
        ("jt", [sys.executable, "-m", f"juicer_tpu.cli.{tool}"]),
    ):
        fsm = tmp_path / f"{tag}.fsm"
        isy = tmp_path / f"{tag}.in"
        osy = tmp_path / f"{tag}.out"
        full = cmd + args + [
            "-fsmFName", str(fsm), "-inSymsFName", str(isy),
            "-outSymsFName", str(osy),
        ]
        r = subprocess.run(full, capture_output=True, text=True,
                           cwd=str(fixtures), timeout=120)
        assert r.returncode == 0, (tag, tool, r.stderr[-500:])
        outs[tag] = (fsm.read_bytes(), isy.read_bytes(), osy.read_bytes())
    for i, name in enumerate(("fsm", "insyms", "outsyms")):
        assert outs["ref"][i] == outs["jt"][i], (tool, args, name)


GRAMGEN_CASES = [
    ["-lexFName", "lex.dict", "-sentStartWord", "<s>", "-sentEndWord", "</s>",
     "-gramType", "ngram", "-lmFName", "lm.arpa"],
    ["-lexFName", "lex.dict", "-sentStartWord", "<s>", "-sentEndWord", "</s>",
     "-gramType", "ngram", "-lmFName", "lm.arpa", "-phiBackoff"],
    ["-lexFName", "lex.dict", "-sentStartWord", "<s>", "-sentEndWord", "</s>",
     "-gramType", "ngram", "-lmFName", "lm.arpa", "-lmScaleFactor", "7.5",
     "-wordInsPen", "1.25"],
    ["-lexFName", "lex.dict", "-gramType", "wordloop"],
    ["-lexFName", "lex.dict", "-sentStartWord", "<s>", "-sentEndWord", "</s>",
     "-gramType", "silwordloopsil"],
]

LEXGEN_BASE = ["-lexFName", "lex.dict", "-monoListFName", "phones.lst",
               "-silMonophone", "sil", "-pauseMonophone", "sp",
               "-sentStartWord", "<s>", "-sentEndWord", "</s>"]
LEXGEN_CASES = [
    LEXGEN_BASE + ["-outputAuxPhones"],
    LEXGEN_BASE + ["-outputAuxPhones", "-addPronunsWithEndSil"],
    LEXGEN_BASE + ["-outputAuxPhones", "-addPronunsWithEndPause",
                   "-pauseTeeTransProb", "0.5"],
    LEXGEN_BASE + ["-outputAuxPhones", "-addPhiLoop"],
    LEXGEN_BASE + ["-outputAuxPhones", "-normalise"],
    LEXGEN_BASE,
]


CDGEN_MONO = ["-cdType", "mono", "-htkModelsFName", "mono.mmf",
              "-monoListFName", "phones.lst", "-tiedListFName", "tied.mono",
              "-silMonophone", "sil", "-pauseMonophone", "sp"]
CDGEN_XWRD = ["-cdType", "xwrdtri", "-htkModelsFName", "tri.mmf",
              "-monoListFName", "phones3.lst", "-tiedListFName", "tied.tri",
              "-silMonophone", "sil", "-pauseMonophone", "sp"]


def _refine_hash(fsm_text):
    """Canonical state-renumbering-invariant signature of a text FSM via
    color refinement: iteratively hash each state's (final?, start?,
    sorted outgoing (il, ol, w, dst-color)) until stable; the sorted
    color multiset is the signature."""
    arcs, finals = [], set()
    start = None
    for ln in fsm_text.strip().split("\n"):
        p = ln.split()
        if len(p) >= 4:
            s, d, il, ol = int(p[0]), int(p[1]), p[2], p[3]
            w = p[4] if len(p) > 4 else "0"
            if start is None:
                start = s
            arcs.append((s, d, il, ol, w))
        elif p:
            finals.add(int(p[0]))
    states = sorted({a[0] for a in arcs} | {a[1] for a in arcs} | finals)
    color = {s: (s == start, s in finals) for s in states}
    for _ in range(len(states)):
        nxt = {}
        for s in states:
            outs = sorted(
                (il, ol, w, color[d]) for (src, d, il, ol, w) in arcs
                if src == s
            )
            nxt[s] = hash((color[s], tuple(outs)))
        if len(set(nxt.values())) == len(set(color.values())):
            color = nxt
            break
        color = nxt
    return sorted(color.values()), len(arcs), len(finals)


def test_cdgen_mono_matches_reference(refbin, fixtures, tmp_path):
    _run_pair(refbin, fixtures, tmp_path, "cdgen", CDGEN_MONO)


def test_cdgen_xwrdtri_equivalent_to_reference(refbin, fixtures, tmp_path):
    """Det-inv cross-word triphone C: same symbol files byte-for-byte;
    the FSM is compared modulo state numbering (the reference's
    WFSTCDStateManager assigns ids in its own emission order) via color
    refinement."""
    outs = {}
    for tag, cmd, sep in (
        ("ref", [str(refbin / "cdgen")], ["-cdSepChars", "-+"]),
        # argparse needs the '=' form for a value starting with '-'
        ("jt", [sys.executable, "-m", "juicer_tpu.cli.cdgen"],
         ["-cdSepChars=-+"]),
    ):
        fsm = tmp_path / f"{tag}.fsm"
        full = cmd + CDGEN_XWRD + sep + [
            "-fsmFName", str(fsm), "-inSymsFName", str(tmp_path / f"{tag}.in"),
            "-outSymsFName", str(tmp_path / f"{tag}.out"),
        ]
        r = subprocess.run(full, capture_output=True, text=True,
                           cwd=str(fixtures), timeout=120)
        assert r.returncode == 0, (tag, r.stderr[-500:])
        outs[tag] = fsm.read_text()
        outs[tag + ".in"] = (tmp_path / f"{tag}.in").read_bytes()
        outs[tag + ".out"] = (tmp_path / f"{tag}.out").read_bytes()
    assert outs["ref.in"] == outs["jt.in"]
    assert outs["ref.out"] == outs["jt.out"]
    assert _refine_hash(outs["ref"]) == _refine_hash(outs["jt"])


@pytest.mark.parametrize("case", range(len(GRAMGEN_CASES)))
def test_gramgen_matches_reference(refbin, fixtures, tmp_path, case):
    _run_pair(refbin, fixtures, tmp_path, "gramgen", GRAMGEN_CASES[case])


@pytest.mark.parametrize("case", range(len(LEXGEN_CASES)))
def test_lexgen_matches_reference(refbin, fixtures, tmp_path, case):
    _run_pair(refbin, fixtures, tmp_path, "lexgen", LEXGEN_CASES[case])
