"""Arabic G2P: text -> Buckwalter-style phoneme tokens.

Capability rebuild of phoonnx/thirdparty/mantoq (mhashim6/Mantoq):
normalization of Arabic orthography, number expansion, and rule-based
phonetization of (ideally diacritized) text into Buckwalter-like tokens
with ``_+_`` word separators, consumable by
:mod:`phoonnx_tpu.thirdparty.bw2ipa`.

This is a from-scratch implementation of the same contract. For best
results, run :class:`~phoonnx_tpu.thirdparty.tashkeel.TashkeelDiacritizer`
first (the reference pipeline does the same via ``add_diacritics``).
"""

import re
from typing import List, Tuple

from phoonnx_tpu.thirdparty.mantoq.num2words import arabic_num2words

# Arabic codepoint -> Buckwalter consonant/letter
_AR2BW = {
    "ء": "'",   # hamza
    "آ": "'A",  # alef madda -> glottal + long a
    "أ": "'",   # alef hamza above
    "ؤ": "'",   # waw hamza
    "إ": "'",   # alef hamza below
    "ئ": "'",   # yeh hamza
    "ا": "A",   # alef (long a)
    "ب": "b",
    "ة": "p",   # teh marbuta (handled contextually)
    "ت": "t",
    "ث": "v",   # thaa -> IPA θ (v in mantoq inventory maps to θ via *)
    "ج": "j",
    "ح": "H",
    "خ": "x",
    "د": "d",
    "ذ": "*",   # dhal -> ð
    "ر": "r",
    "ز": "z",
    "س": "s",
    "ش": "$",   # sheen -> ʃ
    "ص": "S",
    "ض": "D",
    "ط": "T",
    "ظ": "Z",
    "ع": "E",   # ain
    "غ": "g",   # ghain
    "ف": "f",
    "ق": "q",
    "ك": "k",
    "ل": "l",
    "م": "m",
    "ن": "n",
    "ه": "h",
    "و": "w",
    "ى": "A",   # alef maqsura -> long a
    "ي": "y",
}

# short vowel diacritics
_HARAKAT = {
    "َ": "a",  # fatha
    "ُ": "u",  # damma
    "ِ": "i",  # kasra
}
_TANWEEN = {
    "ً": "an",  # fathatan
    "ٌ": "un",  # dammatan
    "ٍ": "in",  # kasratan
}
_SUKUN = "ْ"
_SHADDA = "ّ"
_TATWEEL = "ـ"

_SUN_LETTERS = set("tv*drzs$SDTZln")

WORD_SEP = "_+_"


def normalize(text: str) -> str:
    """Orthographic cleanup: strip tatweel, unify spacing, keep harakat."""
    text = text.replace(_TATWEEL, "")
    text = re.sub(r"\s+", " ", text).strip()
    return text


def _expand_numbers(text: str) -> str:
    return re.sub(
        r"\d+(?:[.,]\d+)?",
        lambda m: arabic_num2words(m.group(0)),
        text,
    )


def _word_to_tokens(word: str) -> List[str]:
    """One Arabic word -> Buckwalter token list with _dbl_ markers."""
    tokens: List[str] = []
    chars = list(word)
    i = 0
    n = len(chars)

    # definite article assimilation: Al + sun letter
    def last_consonant() -> str:
        for tok in reversed(tokens):
            if tok not in ("a", "i", "u", "_dbl_"):
                return tok
        return ""

    while i < n:
        ch = chars[i]
        if ch in _AR2BW:
            bw = _AR2BW[ch]
            if ch == "ة":  # teh marbuta: 't' unless word-final
                is_final = all(
                    c in _HARAKAT or c in _TANWEEN or c in (_SUKUN, _SHADDA)
                    for c in chars[i + 1:]
                )
                bw = "h" if is_final and not any(
                    c in _TANWEEN for c in chars[i + 1:]
                ) else "t"
            tokens.extend(list(bw) if len(bw) > 1 and bw != "'A" else [bw]
                          if bw != "'A" else ["'", "A"])
        elif ch in _HARAKAT:
            tokens.append(_HARAKAT[ch])
        elif ch in _TANWEEN:
            tokens.extend(list(_TANWEEN[ch]))
        elif ch == _SHADDA:
            tokens.append("_dbl_")
        elif ch == _SUKUN:
            pass  # explicit absence of vowel
        else:
            # non-Arabic character: keep as-is
            tokens.append(ch)
        i += 1

    # sun-letter assimilation: 'Al' + sun letter -> l dropped, gemination
    if len(tokens) >= 3 and tokens[0] == "A" and tokens[1] == "l":
        nxt = tokens[2] if tokens[2] not in ("a", "i", "u") else (
            tokens[3] if len(tokens) > 3 else "")
        if nxt in _SUN_LETTERS:
            tokens = ["a"] + tokens[2:] + []
            # geminate the sun letter
            idx = 1
            tokens.insert(idx + 1, "_dbl_")
        else:
            tokens = ["a", "l"] + tokens[2:]
    return tokens


def g2p(text: str) -> Tuple[str, List[str]]:
    """Arabic text -> (normalized_text, phoneme token list).

    Matches the reference call surface (thirdparty/mantoq/__init__.py:24):
    tokens join with ``_+_`` between words.
    """
    normalized = normalize(_expand_numbers(text))
    words = [w for w in re.split(r"[\s]+", normalized) if w]
    tokens: List[str] = []
    for idx, word in enumerate(words):
        word = re.sub(r"[^\w؀-ۿ]+", "", word)
        if not word:
            continue
        if idx and tokens:
            tokens.append(WORD_SEP)
        tokens.extend(_word_to_tokens(word))
    return normalized, tokens
