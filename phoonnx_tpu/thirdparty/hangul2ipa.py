"""Hangul -> IPA via Korean phonological rules.

Capability rebuild of phoonnx/thirdparty/hangul2ipa.py (stannam/hangul_to_ipa):
syllables decompose into jamo, a cascade of phonological rules applies
(palatalization, aspiration, assimilation, tensification, coda-cluster
simplification, coda neutralization, intersonorant h-deletion, optional
non-coronalization), then jamo map to IPA symbols with intersonorant
voicing and l/ɾ alternation. Rule data ships as CSV tables in
``ko_tables/`` (interchange data shared with the reference).
"""

import csv
import os
import re
from functools import lru_cache
from typing import Dict, List, Tuple

_TABLES_DIR = os.path.join(os.path.dirname(__file__), "ko_tables")

GA_CODE = 44032
ONSET_SPAN = 588
CODA_SPAN = 28

ONSET_LIST = ('ㄱ', 'ㄲ', 'ㄴ', 'ㄷ', 'ㄸ', 'ㄹ', 'ㅁ', 'ㅂ', 'ㅃ', 'ㅅ', 'ㅆ',
              'ㅇ', 'ㅈ', 'ㅉ', 'ㅊ', 'ㅋ', 'ㅌ', 'ㅍ', 'ㅎ')
VOWEL_LIST = ('ㅏ', 'ㅐ', 'ㅑ', 'ㅒ', 'ㅓ', 'ㅔ', 'ㅕ', 'ㅖ', 'ㅗ', 'ㅘ', 'ㅙ',
              'ㅚ', 'ㅛ', 'ㅜ', 'ㅝ', 'ㅞ', 'ㅟ', 'ㅠ', 'ㅡ', 'ㅢ', 'ㅣ')
CODA_LIST = ('', 'ㄱ', 'ㄲ', 'ㄳ', 'ㄴ', 'ㄵ', 'ㄶ', 'ㄷ', 'ㄹ', 'ㄺ', 'ㄻ',
             'ㄼ', 'ㄽ', 'ㄾ', 'ㄿ', 'ㅀ', 'ㅁ', 'ㅂ', 'ㅄ', 'ㅅ', 'ㅆ', 'ㅇ',
             'ㅈ', 'ㅊ', 'ㅋ', 'ㅌ', 'ㅍ', 'ㅎ')

C_SONORANT_JAMO = ('ㄴ', 'ㄹ', 'ㅇ', 'ㅁ')


@lru_cache(maxsize=8)
def _load_table(name: str) -> Dict[str, Tuple[str, ...]]:
    path = os.path.join(_TABLES_DIR, f"{name}.csv")
    columns: Dict[str, List[str]] = {}
    with open(path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            for header, value in row.items():
                columns.setdefault(header, []).append(value)
    return {k: tuple(v) for k, v in columns.items()}


def _sub_table(name: str, text: str) -> str:
    table = _load_table(name)
    for src, dst in zip(table["_from"], table["_to"]):
        text = text.replace(src, dst)
    return text


@lru_cache(maxsize=1)
def _inventories():
    ipa = _load_table("ipa")
    consonants = tuple(ipa["C"][:-2])  # strip the '#'/'$' sentinel rows
    vowels = tuple(ipa["V"])
    obstruents = tuple(set(consonants) - set(C_SONORANT_JAMO))
    sonorants = vowels + C_SONORANT_JAMO
    return consonants, vowels, obstruents, sonorants


def hangul_to_jamos(hangul: str) -> List[str]:
    out = []
    for letter in hangul:
        code = ord(letter)
        if GA_CODE <= code <= 55203:
            offset = code - GA_CODE
            onset = offset // ONSET_SPAN
            vowel = (offset % ONSET_SPAN) // CODA_SPAN
            coda = offset % CODA_SPAN
            out.append(ONSET_LIST[onset] + VOWEL_LIST[vowel] + CODA_LIST[coda])
        else:
            out.append(letter)
    return out


def _separate_double_coda(syllables: List[str]) -> List[str]:
    table = _load_table("double_coda")
    out = []
    for syllable in syllables:
        if len(syllable) >= 3 and syllable[2] in table["_double"]:
            idx = table["_double"].index(syllable[2])
            out.append(syllable[:2] + table["_separated"][idx])
        else:
            out.append(syllable)
    return out


def to_jamo(hangul: str) -> str:
    """Hangul -> jamo string; separates double codas, drops empty onsets."""
    cleaned = re.sub(r"[^가-힣ㄱ-ㅎㅏ-ㅣ]", "", hangul)
    syllables = _separate_double_coda(hangul_to_jamos(cleaned))
    return "".join(
        syl[1:] if syl and syl[0] == "ㅇ" else syl for syl in syllables
    )


def _mark_cv(jamo: str) -> str:
    consonants, vowels, _, _ = _inventories()
    out = ""
    for j in jamo:
        if j in vowels:
            out += "V"
        elif j in consonants:
            out += "C"
    return out


# ---------------------------------------------------------------------------
# Phonological rules
# ---------------------------------------------------------------------------

_PALATAL = {"ㄷ": "ㅈ", "ㅌ": "ㅊ"}


def _palatalize(hangul: str) -> str:
    syllables = [to_jamo(s) for s in hangul]
    for i in range(len(syllables) - 1):
        nxt = syllables[i + 1]
        if nxt and nxt[0] == "ㅣ" and syllables[i]:
            last = syllables[i][-1]
            syllables[i] = syllables[i][:-1] + _PALATAL.get(last, last)
    return "".join(syllables)


def _neutralize(jamo: str) -> str:
    cv = _mark_cv(jamo)
    table = _load_table("neutralization")
    out = list(jamo)
    for i, j in enumerate(out):
        if i == len(out) - 1 or (i + 1 < len(cv) and cv[i + 1] == "C"):
            if j in table["_from"]:
                out[i] = table["_to"][table["_from"].index(j)]
    return "".join(out)


def _delete_h(jamo: str) -> str:
    _, _, _, sonorants = _inventories()
    locations = [m.start() for m in re.finditer("(?=ㅎ)", jamo)]
    for loc in reversed(locations):
        if loc == 0 or loc == len(jamo) - 1:
            continue
        if jamo[loc - 1] in sonorants and jamo[loc + 1] in sonorants:
            jamo = jamo[:loc] + jamo[loc + 1:]
    return jamo


def _simplify_coda(jamo: str) -> str:
    table = _load_table("double_coda")

    def simplify_at(text: str, loc: int) -> str:
        double = text[loc + 1:loc + 3]
        if double in table["_separated"]:
            idx = table["_separated"].index(double)
            return text[:loc + 1] + table["_to"][idx] + text[loc + 3:]
        return text

    while True:
        cv = _mark_cv(jamo)
        locs = [m.start() for m in re.finditer("(?=VCCC)", cv)]
        if not locs:
            break
        jamo = simplify_at(jamo, locs[0])

    cv = _mark_cv(jamo)
    final_cc = [m.start() for m in re.finditer("(?=CC$)", cv)]
    if final_cc:
        jamo = simplify_at(jamo, final_cc[0] - 1)
    return jamo


def _non_coronalize(jamo: str) -> str:
    velars = "ㄱㅋㄲ"
    bilabials = "ㅂㅍㅃㅁ"
    out = list(jamo)
    for i in range(1, len(jamo) - 1):
        if jamo[i] not in "ㅁㄴ":
            continue
        nxt = jamo[i + 1]
        if nxt in velars:
            out[i] = "ㅇ"
        elif nxt in bilabials:
            out[i] = "ㅁ"
    return "".join(out)


def _transcribe(jamos: str) -> List[str]:
    ipa = _load_table("ipa")
    out = []
    for j in jamos:
        if j in ipa["V"]:
            out.append(ipa["VSymbol"][ipa["V"].index(j)])
        elif j in ipa["C"]:
            out.append(ipa["CSymbol"][ipa["C"].index(j)])
    return out


_VOICING = {"p": "b", "t": "d", "k": "ɡ", "tɕ": "dʑ"}


def _inter_v(symbols: List[str]) -> List[str]:
    _, _, _, sonorants = _inventories()
    ipa_sonorants = ["".join(_transcribe(s)) for s in sonorants]
    out = list(symbols)
    for i in range(1, len(symbols) - 1):
        if symbols[i] not in _VOICING:
            continue
        if symbols[i - 1] in ipa_sonorants:
            if symbols[i + 1] in ipa_sonorants:
                out[i] = _VOICING[symbols[i]]
            elif symbols[i + 1] == "ɕ":
                out[i] = _VOICING[symbols[i]]
                out[i + 1] = "ʑ"
    return out


def _alternate_lr(symbols: List[str]) -> List[str]:
    _, vowels, _, _ = _inventories()
    ipa_vowels = ["".join(_transcribe(v)) for v in vowels]
    out = list(symbols)
    for i in range(1, len(symbols) - 1):
        if symbols[i] == "l" and symbols[i - 1] in ipa_vowels \
                and symbols[i + 1] in ipa_vowels:
            out[i] = "ɾ"
    return out


def convert_word(hangul: str, rules: str = "pastcnhovr") -> str:
    """One word of hangul -> IPA string."""
    if not hangul:
        return ""
    _, _, obstruents, _ = _inventories()

    jamo = to_jamo(hangul)
    jamo = _simplify_coda(jamo)

    if "p" in rules and ("ㄷㅣ" in jamo or "ㅌㅣ" in jamo):
        jamo = _palatalize(hangul)
    if "a" in rules and "ㅎ" in jamo:
        jamo = _sub_table("aspiration", jamo)
    if "s" in rules:
        jamo = _sub_table("assimilation", jamo)
    if "t" in rules and any(j in jamo for j in obstruents):
        jamo = _sub_table("tensification", jamo)
    if "c" in rules:
        jamo = _simplify_coda(jamo)
    if "n" in rules:
        jamo = _neutralize(jamo)
    if "h" in rules and "ㅎ" in jamo[1:-1]:
        jamo = _delete_h(jamo)
    if "o" in rules:
        jamo = _non_coronalize(jamo)

    symbols = _transcribe(jamo)
    if "v" in rules:
        symbols = _inter_v(symbols)
    if "r" in rules and "l" in symbols:
        symbols = _alternate_lr(symbols)
    return "".join(symbols)


def hangul2ipa(input_text: str) -> str:
    """Space-separated hangul words -> space-separated IPA."""
    return " ".join(convert_word(w) for w in input_text.split())
