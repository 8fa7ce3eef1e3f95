"""Phoneme sequence -> integer id sequence tokenization.

TPU-native rebuild of the phoneme tokenizer with the same observable behavior
as the reference implementation (reference: phoonnx/phoneme_ids.py:209-310).
The id layout is the piper-standard one: ``_``=0 (pad/blank), ``^``=1 (bos),
``$``=2 (eos), `` ``=3 (word separator), followed by punctuation, latin
letters and the IPA inventory (reference: phoonnx/phoneme_ids.py:20-182).

Deliberate divergences from the reference (documented, not bugs):

* ``bos_token`` given as an ``int`` resolves to itself; the reference
  accidentally resolves it to ``eos_token`` (phoneme_ids.py:238). The int
  branch is never hit by any shipped config.
"""

import json
import logging
import os
from enum import Enum
from typing import Dict, List, Mapping, Optional, Sequence, Set, TextIO, Union

LOG = logging.getLogger(__name__)

PHONEME_ID_LIST = List[int]
PHONEME_ID_MAP = Dict[str, int]
PHONEME_LIST = List[str]
PHONEME_WORD_LIST = List[PHONEME_LIST]

# The 161-symbol default IPA inventory, stored as a JSON array indexed by id.
# This is interchange *data* shared with piper/phoonnx checkpoints; the symbol
# at index i has phoneme id i.
_TABLE_PATH = os.path.join(os.path.dirname(__file__), "_ipa_table.json")

with open(_TABLE_PATH, encoding="utf-8") as _f:
    _DEFAULT_IPA_SYMBOLS: List[str] = json.load(_f)

DEFAULT_IPA_PHONEME_ID_MAP: Dict[str, PHONEME_ID_LIST] = {
    sym: [idx] for idx, sym in enumerate(_DEFAULT_IPA_SYMBOLS)
}

DEFAULT_PAD_TOKEN = "_"  # id 0, also used as the blank token
DEFAULT_BLANK_TOKEN = "_"
DEFAULT_BOS_TOKEN = "^"  # id 1
DEFAULT_EOS_TOKEN = "$"  # id 2
DEFAULT_BLANK_WORD_TOKEN = " "  # id 3

STRESS: Set[str] = {"ˈ", "ˌ"}
"""IPA primary/secondary stress marks."""

PUNCTUATION_MAP: Mapping[str, str] = {";": ",", ":": ",", "?": ".", "!": "."}
"""Long/short pause simplification used by some front-ends."""


class BlankBetween(str, Enum):
    """Where blank tokens are inserted relative to phonemes/words."""

    TOKENS = "tokens"
    WORDS = "words"
    TOKENS_AND_WORDS = "tokens_and_words"


def _resolve_special(
    token: Optional[Union[str, int]],
    id_map: Mapping[str, Sequence[int]],
) -> List[int]:
    """Resolve a special token to its id list (falls back to len(id_map))."""
    if isinstance(token, int):
        return [token]
    if token:
        return list(id_map.get(token, [len(id_map)]))
    return [len(id_map)]


def phonemes_to_ids(
    phonemes: PHONEME_LIST,
    id_map: Optional[Mapping[str, Union[int, Sequence[int]]]] = None,
    blank_token: Optional[str] = DEFAULT_BLANK_TOKEN,
    bos_token: Optional[str] = DEFAULT_BOS_TOKEN,
    eos_token: Optional[str] = DEFAULT_EOS_TOKEN,
    word_sep_token: Optional[str] = DEFAULT_BLANK_WORD_TOKEN,
    include_whitespace: Optional[bool] = True,
    blank_at_start: bool = True,
    blank_at_end: bool = True,
    blank_between: BlankBetween = BlankBetween.TOKENS_AND_WORDS,
) -> PHONEME_ID_LIST:
    """Convert a phoneme list to model input ids.

    Matches the reference tokenizer behavior (phoonnx/phoneme_ids.py:209):
    bos/eos wrapping, blank insertion in the three `BlankBetween` modes,
    longest-match compound-phoneme (diphthong) resolution for mimic3-style
    maps, whitespace vs word-separator substitution, and warn-and-skip for
    unknown phonemes.
    """
    if not phonemes:
        return []
    if not id_map:
        id_map = DEFAULT_IPA_PHONEME_ID_MAP

    # Normalize piper-style scalar maps to id lists.
    norm_map: Dict[str, List[int]] = {
        k: list(v) if isinstance(v, (list, tuple)) else [v] for k, v in id_map.items()
    }

    blank_id = _resolve_special(blank_token, norm_map)
    bos_id = _resolve_special(bos_token, norm_map)
    eos_id = _resolve_special(eos_token, norm_map)

    blank_tokens = blank_token is not None and blank_between in (
        BlankBetween.TOKENS,
        BlankBetween.TOKENS_AND_WORDS,
    )
    blank_words = blank_token is not None and blank_between in (
        BlankBetween.WORDS,
        BlankBetween.TOKENS_AND_WORDS,
    )

    ids: List[int] = []
    if bos_token is not None:
        ids.extend(bos_id)
    if blank_token is not None and blank_at_start:
        ids.extend(blank_id)

    # Multi-character symbols in the map (mimic3 diphthongs): longest first so
    # the greedy scan prefers the most specific match.
    compounds = sorted((k for k in norm_map if len(k) > 1), key=len, reverse=True)

    n_phonemes = len(phonemes)
    i = 0
    while i < n_phonemes:
        matched_len = 0
        for compound in compounds:
            n = len(compound)
            if "".join(phonemes[i : i + n]) == compound:
                ids.extend(norm_map[compound])
                if blank_tokens and i + n < n_phonemes:
                    ids.extend(blank_id)
                matched_len = n
                break
        if matched_len:
            i += matched_len
            continue

        phoneme = phonemes[i]
        if phoneme not in norm_map:
            if not (phoneme == " " and not include_whitespace):
                LOG.warning("Missing phoneme from id map: %s", phoneme)
            i += 1
            continue

        if phoneme == " ":
            if include_whitespace:
                ids.extend(norm_map[phoneme])
                if blank_tokens:
                    ids.extend(blank_id)
            elif blank_words:
                if word_sep_token in norm_map:
                    ids.extend(norm_map[word_sep_token])
                else:
                    LOG.warning("word separator %r not in id map — "
                                "skipped", word_sep_token)
                if blank_tokens:
                    ids.extend(blank_id)
        else:
            ids.extend(norm_map[phoneme])
            if blank_tokens and i < n_phonemes - 1:
                ids.extend(blank_id)
        i += 1

    if blank_token is not None and blank_at_end:
        if (not include_whitespace and blank_words
                and word_sep_token in norm_map):
            if blank_tokens:
                ids.extend(blank_id)
            ids.extend(norm_map[word_sep_token])
            if blank_tokens:
                ids.extend(blank_id)
        else:
            ids.extend(blank_id)
    if eos_token is not None:
        ids.extend(eos_id)

    return ids


def load_phoneme_ids(phonemes_file: TextIO) -> PHONEME_ID_MAP:
    """Parse a mimic3-style ``phonemes.txt`` (``ID<space>PHONEME`` lines).

    Reference-parity loader (phoonnx/phoneme_ids.py:312-341), including
    its edge semantics: a digits-plus-trailing-space line maps
    whitespace to that id (a BARE number line without the trailing
    space has no space and is skipped, like any space-free line);
    ``PHONEME<space>ID`` order is tolerated; comments (#), blank and
    space-free lines are skipped; a line whose id field is not numeric
    raises ValueError (the reference crashes identically — voices do
    not ship such files).
    """
    phoneme_to_id: PHONEME_ID_MAP = {}
    for line in phonemes_file:
        line = line.strip("\r\n")
        if not line or line.startswith("#") or " " not in line:
            continue

        if line.strip().isdigit():
            # Only an id: the phoneme is the whitespace character itself.
            phoneme_to_id[" "] = int(line)
            continue

        first, rest = line.split(" ", maxsplit=1)
        if rest.isdigit():
            # PHONEME ID order
            first, rest = rest, first
        phoneme_to_id[rest] = int(first)

    return phoneme_to_id


def load_phoneme_map(phoneme_map_file: TextIO) -> Dict[str, List[str]]:
    """Parse a phoneme substitution table (``FROM TO [TO...]`` lines).

    Reference: phoonnx/phoneme_ids.py:344-371. An empty target maps to
    whitespace.
    """
    phoneme_map: Dict[str, List[str]] = {}
    for line in phoneme_map_file:
        line = line.strip("\r\n")
        if not line or line.startswith("#") or " " not in line:
            continue

        from_phoneme, to_str = line.split(" ", maxsplit=1)
        phoneme_map[from_phoneme] = to_str.split() if to_str.strip() else [" "]

    return phoneme_map
