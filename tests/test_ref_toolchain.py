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


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    td = tmp_path_factory.mktemp("fix")
    (td / "lex.dict").write_text(
        "a(1.0) ah\ncat k ae t\ndog d ao g\nad ah d\n<s> sil\n</s> sil\n"
    )
    (td / "phones.lst").write_text("ah\nk\nae\nt\nd\nao\ng\nsil\nsp\n")
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


@pytest.mark.parametrize("case", range(len(GRAMGEN_CASES)))
def test_gramgen_matches_reference(refbin, fixtures, tmp_path, case):
    _run_pair(refbin, fixtures, tmp_path, "gramgen", GRAMGEN_CASES[case])


@pytest.mark.parametrize("case", range(len(LEXGEN_CASES)))
def test_lexgen_matches_reference(refbin, fixtures, tmp_path, case):
    _run_pair(refbin, fixtures, tmp_path, "lexgen", LEXGEN_CASES[case])
