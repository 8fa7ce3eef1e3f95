"""Host-side sentence tokenization.

Replaces the reference's ``quebra_frases.sentence_tokenize`` dependency
(reference: phoonnx/phonemizers/base.py:147) with a self-contained splitter.
Sentences keep their terminating punctuation; abbreviations, decimal numbers,
ellipses and initials do not break sentences.
"""

import re
from typing import List

# Common abbreviations that end with '.' but do not terminate a sentence.
_ABBREVIATIONS = {
    "mr", "mrs", "ms", "dr", "prof", "sr", "sra", "srta", "jr", "st",
    "vs", "etc", "eg", "e.g", "ie", "i.e", "inc", "ltd", "co", "corp",
    "dept", "est", "fig", "gen", "gov", "hon", "num", "p", "pp",
    "rev", "sgt", "capt", "cmdr", "col", "lt", "maj", "sen", "rep",
    "approx", "appt", "apt", "ave", "blvd", "rd", "mt", "ft",
}

_SENT_END = re.compile(
    r"""
    ([.!?…]+ | \.\.\.)     # terminator run
    (["'”’)\]]*)           # optional closing quotes/brackets
    \s+                    # whitespace between sentences
    """,
    re.VERBOSE,
)


def _is_abbreviation(prefix: str, following: str = "") -> bool:
    word = prefix.rsplit(" ", 1)[-1].rstrip(".").lower()
    if not word:
        return False
    if word in _ABBREVIATIONS:
        return True
    # "no." is the numero abbreviation only before a number ("no. 5");
    # as a plain word ("I said no.") it ends the sentence
    if word == "no" and following[:1].isdigit():
        return True
    # Single-letter initials ("J. Smith", "John J. Smith") suppress the
    # break only when capitalized context surrounds the letter —
    # "plan B. Next we go." (lowercase word before) is two sentences
    # name context after the initial: a capitalized word ("Smith")
    # or another initial ("R." in "J. R. Smith")
    name_follows = following[:1].isupper() and (
        following[1:2].islower() or following[1:2] == "."
    )
    if not (len(word) == 1 and word.isalpha() and name_follows):
        return False
    words = prefix.split()
    if len(words) < 2:
        return True  # sentence-initial initial: "J. Smith said..."
    return words[-2][:1].isupper()


def sentence_tokenize(text: str) -> List[str]:
    """Split text into sentences, keeping terminal punctuation attached."""
    text = text.strip()
    if not text:
        return []

    sentences: List[str] = []
    start = 0
    for match in _SENT_END.finditer(text):
        end = match.end(2) if match.group(2) else match.end(1)
        terminator = match.group(1)
        prefix = text[start : match.start(1)]

        if terminator == "." and _is_abbreviation(prefix,
                                                  text[match.end():]):
            continue
        # Decimal numbers like "3. 14" never appear; "3.14" has no whitespace
        # after the dot, so the regex already skips them.

        candidate = text[start:end].strip()
        if candidate:
            sentences.append(candidate)
        start = match.end()

    remainder = text[start:].strip()
    if remainder:
        sentences.append(remainder)
    return sentences
