"""HTK regression-class-tree MLLR adaptation (model-space mean transforms).

Rebuild of the HTKLib HAdapt regression-class machinery the reference
reaches through `HModels` (`/root/reference/src/HModels.h:14-120`,
`HModels.cpp:158-183` — transform handling is delegated to HTKLib's
AddInXFormDir / XFInfo): a ``~b`` base-class file assigns Gaussian
components to numbered classes via HTK item lists, a ``~r`` regression
tree arranges those classes in a tree (used at estimation time to back
off sparse classes to ancestors), and a transform file carries an
``<XFORMSET>`` with ``<NUMXFORMS>`` linear transforms plus an
``<XFORMWGTSET>`` assigning each base class its transform. Applying a
saved transform set therefore needs only the base classes and the
class→transform table; the tree is parsed for completeness and for
``<CLASSXFORM>`` entries that name tree nodes.

MLLRMEAN semantics (HTKBook §9): per class c with transform (A_c, b_c),
every Gaussian mean in the class becomes mu' = A_c mu + b_c; variances
and weights are unchanged. Components whose class has no transform (or
that match no base class) are left untouched, matching HAdapt.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from fnmatch import fnmatchcase
from typing import Optional

import numpy as np

from .xform import InputXform, _TOKEN_RE

# ---------------------------------------------------------------------------
# HTK item lists: {(ax,eh-b+d).state[2-4].mix[1-12]}, {*.state[2].mix[1]}
# ---------------------------------------------------------------------------

_ITEM_RE = re.compile(
    r"^(?:\((?P<names>[^)]*)\)|(?P<name>[^.{}()]+))"
    r"\.state\[(?P<state>[^\]]+)\]"
    r"(?:\.stream\[(?P<stream>[^\]]+)\])?"
    r"(?:\.mix\[(?P<mix>[^\]]+)\])?$"
)


def _parse_index_spec(spec: str) -> list[tuple[int, int]]:
    """``"1,3,5-7"`` -> [(1,1),(3,3),(5,7)] inclusive ranges."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-", 1)
            out.append((int(lo), int(hi)))
        else:
            out.append((int(part), int(part)))
    return out


def _spec_matches(ranges: Optional[list[tuple[int, int]]], i: int) -> bool:
    if ranges is None:  # absent spec matches everything (HTK: all mixes)
        return True
    return any(lo <= i <= hi for lo, hi in ranges)


@dataclass
class ItemPattern:
    """One item of an HTK item list, matched against (hmm, state, mix).

    State and mix numbers are HTK 1-based (emitting states start at 2).
    """

    names: list[str]  # glob patterns; ["*"] matches any model
    states: list[tuple[int, int]]
    mixes: Optional[list[tuple[int, int]]]  # None = all

    def matches(self, hmm_name: str, state_no: int, mix_no: int) -> bool:
        if not _spec_matches(self.states, state_no):
            return False
        if not _spec_matches(self.mixes, mix_no):
            return False
        return any(fnmatchcase(hmm_name, pat) for pat in self.names)


def parse_item_list(text: str) -> list[ItemPattern]:
    """Parse the body of a ``{...}`` item list (braces optional)."""
    # braces only ever delimit (possibly several) item groups — drop them all
    text = text.replace("{", "").replace("}", "").strip()
    # split on commas that are not inside (...) or [...]
    items, depth, cur = [], 0, []
    for ch in text:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur))

    out = []
    for raw in items:
        raw = raw.strip()
        if not raw:
            continue
        m = _ITEM_RE.match(raw)
        if not m:
            raise ValueError(f"unsupported item pattern: {raw!r}")
        if m.group("names") is not None:
            names = [n.strip() for n in m.group("names").split(",") if n.strip()]
        else:
            names = [m.group("name").strip()]
        states = _parse_index_spec(m.group("state"))
        mixes = _parse_index_spec(m.group("mix")) if m.group("mix") else None
        out.append(ItemPattern(names=names, states=states, mixes=mixes))
    return out


# ---------------------------------------------------------------------------
# ~b base-class file
# ---------------------------------------------------------------------------


@dataclass
class BaseClasses:
    name: str = ""
    mmf_id_mask: str = "*"
    parameters: str = "MIXBASE"
    num_classes: int = 0
    # class number (1-based) -> item patterns
    class_items: dict[int, list[ItemPattern]] = field(default_factory=dict)

    def class_of(self, hmm_name: str, state_no: int, mix_no: int) -> int:
        """Base class of one Gaussian component; 0 if no class matches."""
        for cls in sorted(self.class_items):
            for it in self.class_items[cls]:
                if it.matches(hmm_name, state_no, mix_no):
                    return cls
        return 0


def _tokenize(path: str) -> list[str]:
    with open(path, "r", errors="replace") as fd:
        return _TOKEN_RE.findall(fd.read())


def _kw(tok: Optional[str]) -> Optional[str]:
    return tok.strip("<>").upper() if tok and tok.startswith("<") else None


def parse_baseclass(path: str) -> BaseClasses:
    toks = _tokenize(path)
    bc = BaseClasses()
    pos = 0
    while pos < len(toks):
        t = toks[pos]
        k = _kw(t)
        if t == "~b" and pos + 1 < len(toks):
            bc.name = toks[pos + 1].strip('"')
            pos += 2
        elif k == "MMFIDMASK":
            bc.mmf_id_mask = toks[pos + 1]
            pos += 2
        elif k == "PARAMETERS":
            bc.parameters = toks[pos + 1].upper()
            pos += 2
        elif k == "NUMCLASSES":
            bc.num_classes = int(toks[pos + 1])
            pos += 2
        elif k == "CLASS":
            cls = int(toks[pos + 1])
            pos += 2
            # the item list runs from '{' to the matching '}' (tokens may
            # glue braces to content; rejoin and rescan by brace depth)
            parts, depth, started = [], 0, False
            while pos < len(toks):
                tok = toks[pos]
                parts.append(tok)
                depth += tok.count("{") - tok.count("}")
                if "{" in tok:
                    started = True
                pos += 1
                if started and depth == 0:
                    break
            bc.class_items[cls] = parse_item_list(" ".join(parts))
        else:
            pos += 1
    if bc.num_classes == 0:
        bc.num_classes = max(bc.class_items, default=0)
    return bc


# ---------------------------------------------------------------------------
# ~r regression tree file
# ---------------------------------------------------------------------------


@dataclass
class RegTree:
    name: str = ""
    baseclass_name: str = ""
    # node -> children (empty for terminals)
    children: dict[int, list[int]] = field(default_factory=dict)
    # terminal node -> base classes
    node_classes: dict[int, list[int]] = field(default_factory=dict)

    def terminal_classes(self, node: int) -> list[int]:
        """All base classes under ``node`` (itself if terminal)."""
        if node in self.node_classes:
            return list(self.node_classes[node])
        out: list[int] = []
        for ch in self.children.get(node, []):
            out.extend(self.terminal_classes(ch))
        return out


def parse_regtree(path: str) -> RegTree:
    toks = _tokenize(path)
    rt = RegTree()
    pos = 0
    while pos < len(toks):
        t = toks[pos]
        k = _kw(t)
        if t == "~r" and pos + 1 < len(toks):
            rt.name = toks[pos + 1].strip('"')
            pos += 2
        elif k == "BASECLASS":
            # <BASECLASS> ~b "name"  (macro reference)
            pos += 1
            if pos < len(toks) and toks[pos] == "~b":
                pos += 1
            if pos < len(toks):
                rt.baseclass_name = toks[pos].strip('"')
                pos += 1
        elif k == "NODE":
            idx = int(toks[pos + 1])
            n = int(toks[pos + 2])
            rt.children[idx] = [int(x) for x in toks[pos + 3 : pos + 3 + n]]
            pos += 3 + n
        elif k == "TNODE":
            idx = int(toks[pos + 1])
            n = int(toks[pos + 2])
            rt.node_classes[idx] = [int(x) for x in toks[pos + 3 : pos + 3 + n]]
            pos += 3 + n
        else:
            pos += 1
    return rt


# ---------------------------------------------------------------------------
# Transform set files (<XFORMSET> with NUMXFORMS transforms + XFORMWGTSET)
# ---------------------------------------------------------------------------


@dataclass
class MeanXformSet:
    """A parsed multi-class transform file.

    xforms: transform number (1-based) -> InputXform (A, b).
    class_to_xform: base class -> transform number.
    kind: XFORMKIND (MLLRMEAN for model-space mean adaptation).
    """

    name: str = ""
    adapt_kind: str = "BASE"
    kind: str = "MLLRMEAN"
    baseclass_name: str = ""
    regtree_name: str = ""
    xforms: dict[int, InputXform] = field(default_factory=dict)
    class_to_xform: dict[int, int] = field(default_factory=dict)

    def xform_for_class(self, cls: int) -> Optional[InputXform]:
        num = self.class_to_xform.get(cls)
        return self.xforms.get(num) if num is not None else None


def parse_xformset(path: str) -> MeanXformSet:
    """Parse an HTK transform file that may hold several ``<LINXFORM>``s.

    Accepts the same grammar as `xform.parse_xform` but keeps every
    transform, indexed by its ``<LINXFORM>`` number, and reads the
    ``<XFORMWGTSET>``/``<CLASSXFORM>`` class assignment table.
    """
    toks = _tokenize(path)
    xs = MeanXformSet()
    pos = 0
    cur_num = 0
    vec_size = 0
    bias: Optional[np.ndarray] = None
    blocks: list[np.ndarray] = []
    logdet = 0.0

    def flush():
        nonlocal bias, blocks, logdet, vec_size
        if not blocks and bias is None:
            return
        D = vec_size or sum(b.shape[0] for b in blocks)
        A = np.eye(D)
        off = 0
        for blk in blocks:
            n = blk.shape[0]
            A[off : off + n, off : off + n] = blk
            off += n
        b = bias if bias is not None else np.zeros(D)
        xs.xforms[cur_num] = InputXform(A=A, b=b, logdet=logdet)
        bias, blocks, logdet = None, [], 0.0

    while pos < len(toks):
        t = toks[pos]
        k = _kw(t)
        if t == "~a" and pos + 1 < len(toks):
            xs.name = toks[pos + 1].strip('"')
            pos += 2
        elif k == "ADAPTKIND":
            xs.adapt_kind = toks[pos + 1].upper()
            pos += 2
        elif k == "XFORMKIND":
            xs.kind = toks[pos + 1].upper()
            pos += 2
        elif k == "BASECLASS":
            pos += 1
            if pos < len(toks) and toks[pos] == "~b":
                pos += 1
            if pos < len(toks):
                xs.baseclass_name = toks[pos].strip('"')
                pos += 1
        elif k == "REGTREE":
            pos += 1
            if pos < len(toks) and toks[pos] == "~r":
                pos += 1
            if pos < len(toks):
                xs.regtree_name = toks[pos].strip('"')
                pos += 1
        elif k == "LINXFORM":
            flush()
            cur_num = int(toks[pos + 1])
            pos += 2
        elif k == "VECSIZE":
            vec_size = int(toks[pos + 1])
            pos += 2
        elif k == "BIAS":
            n = int(toks[pos + 1])
            bias = np.array([float(x) for x in toks[pos + 2 : pos + 2 + n]])
            pos += 2 + n
        elif k == "LOGDET":
            logdet = float(toks[pos + 1])
            pos += 2
        elif k == "XFORM":
            r = int(toks[pos + 1])
            c = int(toks[pos + 2])
            vals = [float(x) for x in toks[pos + 3 : pos + 3 + r * c]]
            blocks.append(np.array(vals).reshape(r, c))
            pos += 3 + r * c
        elif k == "CLASSXFORM":
            xs.class_to_xform[int(toks[pos + 1])] = int(toks[pos + 2])
            pos += 3
        else:
            pos += 1
    flush()
    if not xs.xforms:
        raise ValueError(f"{path}: no <LINXFORM> found")
    if not xs.class_to_xform:
        # single global transform with no weight set: class 1 -> xform 1
        only = min(xs.xforms)
        xs.class_to_xform = {1: only}
    return xs


# ---------------------------------------------------------------------------
# Application to an AcousticModelSet
# ---------------------------------------------------------------------------


def component_classes(models, baseclasses: BaseClasses) -> list[np.ndarray]:
    """Per-GMM (C,) int arrays: the base class of each mixture component.

    Class assignment follows HAdapt's physical scan: each GMM takes the
    class of its first occurrence as (hmm, state). HTK state numbers are
    1-based with state 1 non-emitting, so emitting state s (0-based) is
    state number s+2; mixture numbers are 1-based.
    """
    out: list[Optional[np.ndarray]] = [None] * len(models.gmm_means)
    for hi, hmm_name in enumerate(models.hmm_names):
        for s, gi in enumerate(models.hmm_gmm_inds[hi]):
            gi = int(gi)
            if out[gi] is not None:
                continue
            C = models.gmm_means[gi].shape[0]
            out[gi] = np.array(
                [baseclasses.class_of(hmm_name, s + 2, m + 1) for m in range(C)],
                dtype=np.int32,
            )
    return [
        c if c is not None else np.zeros(models.gmm_means[i].shape[0], dtype=np.int32)
        for i, c in enumerate(out)
    ]


def apply_mllr_means(models, xset: MeanXformSet, baseclasses: Optional[BaseClasses] = None):
    """Model-space MLLR: return a copy of ``models`` with each Gaussian
    mean transformed by its regression class's transform.

    With no base classes (or a single-transform set), every component uses
    transform 1 — identical to `AcousticModelSet.with_mean_transform`.
    """
    from .models import AcousticModelSet

    if baseclasses is None or len(xset.xforms) == 1 and xset.class_to_xform == {1: min(xset.xforms)}:
        classes = [np.ones(m.shape[0], dtype=np.int32) for m in models.gmm_means]
    else:
        classes = component_classes(models, baseclasses)

    ms = AcousticModelSet()
    ms.vec_size = models.vec_size
    ms.hybrid_mode = models.hybrid_mode
    ms.log_priors = models.log_priors
    ms.gmm_names = list(models.gmm_names)
    ms.gmm_vars = [v.copy() for v in models.gmm_vars]
    ms.gmm_log_weights = [w.copy() for w in models.gmm_log_weights]
    ms.trans_mats = models.trans_mats
    ms._trans_names = models._trans_names
    ms.hmm_names = models.hmm_names
    ms.hmm_gmm_inds = models.hmm_gmm_inds
    ms.hmm_trans_ind = models.hmm_trans_ind
    ms._hmm_index = models._hmm_index
    ms._gmm_name_index = models._gmm_name_index

    new_means = []
    for mean, cls in zip(models.gmm_means, classes):
        out = mean.copy()
        for c in np.unique(cls):
            xf = xset.xform_for_class(int(c)) if c > 0 else None
            if xf is None:
                continue
            sel = cls == c
            out[sel] = mean[sel] @ xf.A.T + xf.b[None, :]
        new_means.append(out)
    ms.gmm_means = new_means
    return ms


def _component_classes_or_global(models, xset, baseclasses):
    if baseclasses is None or (
        len(xset.xforms) == 1 and xset.class_to_xform == {1: min(xset.xforms)}
    ):
        return [np.ones(m.shape[0], dtype=np.int32) for m in models.gmm_means]
    return component_classes(models, baseclasses)


def _models_shell(models):
    from .models import AcousticModelSet

    ms = AcousticModelSet()
    ms.vec_size = models.vec_size
    ms.hybrid_mode = models.hybrid_mode
    ms.log_priors = models.log_priors
    ms.gmm_names = list(models.gmm_names)
    ms.gmm_means = [m.copy() for m in models.gmm_means]
    ms.gmm_vars = [v.copy() for v in models.gmm_vars]
    ms.gmm_log_weights = [w.copy() for w in models.gmm_log_weights]
    ms.trans_mats = models.trans_mats
    ms._trans_names = models._trans_names
    ms.hmm_names = models.hmm_names
    ms.hmm_gmm_inds = models.hmm_gmm_inds
    ms.hmm_trans_ind = models.hmm_trans_ind
    ms._hmm_index = models._hmm_index
    ms._gmm_name_index = models._gmm_name_index
    return ms


def apply_mllr_var(models, xset: MeanXformSet,
                   baseclasses: Optional[BaseClasses] = None):
    """Model-space MLLRVAR variance adaptation (HAdapt XFORMKIND MLLRVAR,
    reachable through HModels, `/root/reference/src/HModels.h:14-120`).

    Per class c with transform H_c: sigma'^2 = diag(H_c Sigma H_c^T),
    i.e. sigma'^2_d = sum_j H[d,j]^2 sigma^2_j — exact for the diagonal
    H HTK estimates for diagonal-covariance systems, and the standard
    diagonal projection otherwise. Means/weights unchanged.
    """
    classes = _component_classes_or_global(models, xset, baseclasses)
    ms = _models_shell(models)
    for gi, (var, cls) in enumerate(zip(models.gmm_vars, classes)):
        out = var.copy()
        for c in np.unique(cls):
            xf = xset.xform_for_class(int(c)) if c > 0 else None
            if xf is None:
                continue
            sel = cls == c
            out[sel] = var[sel] @ (xf.A.T ** 2)
        ms.gmm_vars[gi] = out
    return ms


def apply_mllr_cov(models, xset: MeanXformSet):
    """Model-space covariance adaptation (HAdapt XFORMKIND MLLRCOV /
    SEMIT: full-covariance transform Sigma' = H Sigma H^T, incl. global
    semi-tied transforms).

    Uses the exact Gaussian identity
        N(x; mu, H Sigma H^T) = |H|^-1 N(H^-1 x; H^-1 mu, Sigma)
    to stay inside the diagonal-covariance machinery: returns
    (adapted models, feature InputXform) where means become H^-1 mu,
    the per-component log-weights absorb -log|H|, and features must be
    passed through x -> H^-1 x (wire the returned InputXform into the
    frontend, e.g. `SpeakerXforms` style). GLOBAL transforms only: a
    per-class H would need a differently-rotated feature stream per
    class (HAdapt's per-class observation cache); estimate semi-tied /
    MLLRCOV globally, as is standard for diagonal systems.
    """
    if len(set(xset.class_to_xform.values())) != 1:
        raise NotImplementedError(
            "apply_mllr_cov: only a GLOBAL MLLRCOV/SEMIT transform is "
            "supported (per-class covariance rotations need per-class "
            "feature streams)"
        )
    xf = xset.xforms[next(iter(set(xset.class_to_xform.values())))]
    H = xf.A
    Hinv = np.linalg.inv(H)
    sign, logdet = np.linalg.slogdet(H)
    if sign <= 0:
        raise ValueError("apply_mllr_cov: transform must have |H| > 0")
    ms = _models_shell(models)
    for gi in range(len(ms.gmm_means)):
        ms.gmm_means[gi] = models.gmm_means[gi] @ Hinv.T
        ms.gmm_log_weights[gi] = models.gmm_log_weights[gi] - logdet
    feat = InputXform(A=Hinv, b=np.zeros(H.shape[0]), logdet=-logdet)
    return ms, feat
