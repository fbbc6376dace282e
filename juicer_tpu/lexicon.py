"""Lexical resources: vocabulary, phone sets, pronunciation lexicon.

Rebuild of the reference layer-2 components:
  - `DecVocabulary` (`/root/reference/src/DecVocabulary.h:28-91`): sorted
    unique word list with special-word char ('!'), sentence start/end and
    silence words, per-word pronunciation counts.
  - `MonophoneLookup`/`DecPhoneInfo` (`/root/reference/src/MonophoneLookup.h:35-147`,
    `DecPhoneInfo.h:27-156`): phone list with silence/pause markers.
  - `DecLexInfo` (`/root/reference/src/DecLexInfo.h:27-114`): pronunciation
    entries {phones, log prior, vocab index} with a word->pronunciations map
    and prior normalization.

Lexicon file format: "word(prior) ph ph ph" with the (prior) optional;
lines starting with '(' or '#' are comments
(`/root/reference/src/DecLexInfo.cpp:120-133`).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Optional

LOG_ZERO = -1e30


class Vocabulary:
    """Sorted unique word list with special-word marking."""

    def __init__(
        self,
        lex_fname: Optional[str] = None,
        spec_word_char: str = "",
        sent_start_word: Optional[str] = None,
        sent_end_word: Optional[str] = None,
        sil_word: Optional[str] = None,
    ):
        self.spec_word_char = spec_word_char
        self.sent_start_index = -1
        self.sent_end_index = -1
        self.sil_index = -1
        self.words: list[str] = []
        self.special: list[bool] = []
        self.n_pronuns: list[int] = []
        self._index: dict[str, int] = {}

        raw: list[tuple[str, bool]] = []
        pronun_counts: dict[str, int] = {}
        if lex_fname is not None:
            with open(lex_fname, "r", errors="replace") as fd:
                for line in fd:
                    if line.startswith("(") or line.startswith("#"):
                        continue
                    parts = line.split()
                    if not parts:
                        continue
                    word = re.split(r"[(]", parts[0])[0]
                    if not word:
                        continue
                    raw.append((word, True))
                    pronun_counts[word] = pronun_counts.get(word, 0) + 1
        for w in (sent_start_word, sent_end_word, sil_word):
            if w:
                raw.append((w, False))
                pronun_counts.setdefault(w, 0)

        uniq = sorted({w for w, _ in raw})
        for w in uniq:
            self._index[w] = len(self.words)
            self.words.append(w)
            self.special.append(bool(spec_word_char) and w.startswith(spec_word_char))
            self.n_pronuns.append(pronun_counts.get(w, 0))

        if sent_start_word:
            self.sent_start_index = self.get_index(sent_start_word)
        if sent_end_word:
            self.sent_end_index = self.get_index(sent_end_word)
        if sil_word:
            self.sil_index = self.get_index(sil_word)
        # sentence start/end words are ALWAYS special, independent of the
        # special-word char (`DecVocabulary.cpp:149-153`) — e.g. lexgen's
        # pronunciation variants skip them even when named "<s>"/"</s>"
        for idx in (self.sent_start_index, self.sent_end_index):
            if idx >= 0:
                self.special[idx] = True

    @property
    def n_words(self) -> int:
        return len(self.words)

    def get_word(self, index: int) -> str:
        return self.words[index]

    def get_index(self, word: str) -> int:
        return self._index.get(word, -1)

    def is_special(self, index: int) -> bool:
        return self.special[index]

    def get_num_pronuns(self, index: int) -> int:
        return self.n_pronuns[index]

    def add_word(self, word: str, special: bool = False) -> int:
        """Add a word (used by tests/tools building vocabs programmatically)."""
        if word in self._index:
            return self._index[word]
        # keep sorted order
        import bisect

        pos = bisect.bisect_left(self.words, word)
        self.words.insert(pos, word)
        self.special.insert(pos, special)
        self.n_pronuns.insert(pos, 0)
        self._index = {w: i for i, w in enumerate(self.words)}
        for attr in ("sent_start_index", "sent_end_index", "sil_index"):
            v = getattr(self, attr)
            if v >= pos:
                setattr(self, attr, v + 1)
        return self._index[word]


class PhoneSet:
    """Monophone list with silence/pause markers.

    Readers: plain ASCII list (one phone per line), Noway-format
    ("<n>\\n index phone" lines) and HTK model lists — the three formats
    accepted by `DecPhoneInfo` (`/root/reference/src/DecPhoneInfo.cpp:75-87`).
    """

    def __init__(
        self,
        list_fname: Optional[str] = None,
        sil_name: Optional[str] = None,
        pause_name: Optional[str] = None,
        phones: Optional[list[str]] = None,
    ):
        self.phones: list[str] = []
        self._index: dict[str, int] = {}
        if list_fname is not None:
            self._read(list_fname)
        elif phones is not None:
            for p in phones:
                self.add(p)
        self.sil_index = self._index.get(sil_name, -1) if sil_name else -1
        self.pause_index = self._index.get(pause_name, -1) if pause_name else -1
        if sil_name and self.sil_index < 0:
            raise ValueError(f"silence phone {sil_name!r} not in phone list")
        if pause_name and self.pause_index < 0:
            raise ValueError(f"pause phone {pause_name!r} not in phone list")

    def _read(self, fname: str) -> None:
        with open(fname, "r", errors="replace") as fd:
            lines = [ln.strip() for ln in fd]
        lines = [ln for ln in lines if ln and not ln.startswith("#")]
        if lines and lines[0].isdigit() and len(lines) > 1 and len(lines[0].split()) == 1:
            # Noway format: first line is the count, then "index phone"
            for ln in lines[1:]:
                parts = ln.split()
                self.add(parts[-1])
        else:
            for ln in lines:
                self.add(ln.split()[0])

    def add(self, phone: str) -> int:
        if phone not in self._index:
            self._index[phone] = len(self.phones)
            self.phones.append(phone)
        return self._index[phone]

    def get_index(self, phone: str) -> int:
        return self._index.get(phone, -1)

    def __len__(self) -> int:
        return len(self.phones)

    def __getitem__(self, i: int) -> str:
        return self.phones[i]


@dataclass
class LexEntry:
    phones: list[int]  # monophone indices
    log_prior: float
    vocab_index: int


@dataclass
class Lexicon:
    """Pronunciation table (DecLexInfo equivalent)."""

    phone_set: PhoneSet
    vocab: Vocabulary
    entries: list[LexEntry] = field(default_factory=list)
    vocab_to_lex: dict[int, list[int]] = field(default_factory=dict)
    sent_start_entry: int = -1
    sent_end_entry: int = -1
    sil_entry: int = -1

    @classmethod
    def load(
        cls,
        mono_list_fname: str,
        lex_fname: str,
        sil_phone: Optional[str] = None,
        pause_phone: Optional[str] = None,
        sent_start_word: Optional[str] = None,
        sent_end_word: Optional[str] = None,
        sil_word: Optional[str] = None,
        spec_word_char: str = "!",
    ) -> "Lexicon":
        phone_set = PhoneSet(mono_list_fname, sil_phone, pause_phone)
        vocab = Vocabulary(lex_fname, spec_word_char, sent_start_word, sent_end_word, sil_word)
        lex = cls(phone_set, vocab)
        with open(lex_fname, "r", errors="replace") as fd:
            for line in fd:
                if line.startswith("(") or line.startswith("#"):
                    continue
                parts = line.split()
                if not parts:
                    continue
                m = re.match(r"([^(\s]+)(?:\((\S+)\))?$", parts[0])
                if not m:
                    continue
                word, prior_s = m.group(1), m.group(2)
                prior = float(prior_s) if prior_s else 1.0
                voc_ind = vocab.get_index(word)
                if voc_ind < 0:
                    raise ValueError(f"word {word!r} not found in vocabulary")
                phones = []
                for ph in parts[1:]:
                    pi = phone_set.get_index(ph)
                    if pi < 0:
                        raise ValueError(f"phone {ph!r} not found in phone list")
                    phones.append(pi)
                if not phones:
                    raise ValueError(f"word {word!r} had no phones")
                lex.add_entry(phones, math.log(prior) if prior > 0 else LOG_ZERO, voc_ind)
        lex._register_specials(sent_start_word, sent_end_word, sil_word)
        return lex

    def add_entry(self, phones: list[int], log_prior: float, vocab_index: int) -> int:
        idx = len(self.entries)
        self.entries.append(LexEntry(list(phones), log_prior, vocab_index))
        self.vocab_to_lex.setdefault(vocab_index, []).append(idx)
        return idx

    def _register_specials(self, sent_start_word, sent_end_word, sil_word) -> None:
        v = self.vocab

        def first_entry(voc_ind):
            lst = self.vocab_to_lex.get(voc_ind, [])
            if len(lst) > 1:
                raise ValueError("cannot have >1 pronunciations of a special word")
            return lst[0] if lst else -1

        if v.sent_start_index >= 0:
            self.sent_start_entry = first_entry(v.sent_start_index)
        if v.sent_end_index >= 0:
            if v.sent_end_index == v.sent_start_index:
                # duplicate the start-word pronunciation as its own entry
                # (`DecLexInfo.cpp:200-221`)
                if self.sent_start_entry >= 0:
                    e = self.entries[self.sent_start_entry]
                    self.sent_end_entry = len(self.entries)
                    self.entries.append(LexEntry(list(e.phones), e.log_prior, e.vocab_index))
            else:
                self.sent_end_entry = first_entry(v.sent_end_index)
        if v.sil_index >= 0:
            if v.sil_index in (v.sent_start_index, v.sent_end_index):
                src = (
                    self.sent_end_entry
                    if v.sil_index == v.sent_end_index
                    else self.sent_start_entry
                )
                if src >= 0:
                    e = self.entries[src]
                    self.sil_entry = len(self.entries)
                    self.entries.append(LexEntry(list(e.phones), e.log_prior, e.vocab_index))
            else:
                self.sil_entry = first_entry(v.sil_index)

    def normalise_pronuns(self) -> None:
        """Renormalize pronunciation priors to sum to one per word
        (`DecLexInfo::normalisePronuns`)."""
        for voc_ind, ents in self.vocab_to_lex.items():
            tot = sum(math.exp(self.entries[i].log_prior) for i in ents)
            if tot <= 0:
                continue
            log_tot = math.log(tot)
            for i in ents:
                self.entries[i].log_prior -= log_tot

    @property
    def n_entries(self) -> int:
        return len(self.entries)
