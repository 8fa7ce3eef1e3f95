"""Tokenizer unit + parity tests (vs reference phoonnx/phoneme_ids.py)."""

import io
import sys

import pytest

from phoonnx_tpu.phoneme_ids import (
    DEFAULT_IPA_PHONEME_ID_MAP,
    BlankBetween,
    load_phoneme_ids,
    load_phoneme_map,
    phonemes_to_ids,
)

from .conftest import REFERENCE_PATH, requires_reference


def test_default_map_layout():
    assert DEFAULT_IPA_PHONEME_ID_MAP["_"] == [0]
    assert DEFAULT_IPA_PHONEME_ID_MAP["^"] == [1]
    assert DEFAULT_IPA_PHONEME_ID_MAP["$"] == [2]
    assert DEFAULT_IPA_PHONEME_ID_MAP[" "] == [3]
    assert len(DEFAULT_IPA_PHONEME_ID_MAP) == 161
    # ids are unique and dense
    ids = sorted(v[0] for v in DEFAULT_IPA_PHONEME_ID_MAP.values())
    assert ids == list(range(161))
    # ASCII g (154) and IPA script g (66) are distinct symbols
    assert DEFAULT_IPA_PHONEME_ID_MAP["g"] == [154]
    assert DEFAULT_IPA_PHONEME_ID_MAP["ɡ"] == [66]


def test_empty():
    assert phonemes_to_ids([]) == []


def test_piper_style_default():
    # piper layout: ^ _ p1 _ p2 _ ... _ $ (blank interspersed)
    ids = phonemes_to_ids(list("ab"))
    assert ids[0] == 1  # bos
    assert ids[1] == 0  # blank at start
    assert ids[-1] == 2  # eos
    assert ids[-2] == 0  # blank at end
    a, b = DEFAULT_IPA_PHONEME_ID_MAP["a"][0], DEFAULT_IPA_PHONEME_ID_MAP["b"][0]
    assert ids == [1, 0, a, 0, b, 0, 2]


def test_whitespace_modes():
    phon = list("a b")
    with_ws = phonemes_to_ids(phon, include_whitespace=True)
    assert DEFAULT_IPA_PHONEME_ID_MAP[" "][0] in with_ws
    words_only = phonemes_to_ids(
        phon, include_whitespace=False, blank_between=BlankBetween.WORDS
    )
    # no interspersed blanks in WORDS mode other than start/end
    a = DEFAULT_IPA_PHONEME_ID_MAP["a"][0]
    b = DEFAULT_IPA_PHONEME_ID_MAP["b"][0]
    assert a in words_only and b in words_only


def test_unknown_phoneme_skipped():
    a = DEFAULT_IPA_PHONEME_ID_MAP["a"][0]
    # The unknown symbol is dropped but still counts as a position, so the
    # inter-token blank after 'a' remains (same as reference).
    assert phonemes_to_ids(["a", "￿"]) == [1, 0, a, 0, 0, 2]


def test_compound_phonemes():
    id_map = {"a": 4, "b": 5, "ab": 6, "_": 0, "^": 1, "$": 2, " ": 3}
    ids = phonemes_to_ids(
        ["a", "b"], id_map=id_map, blank_between=BlankBetween.WORDS
    )
    # longest match 'ab' consumed both symbols
    assert 6 in ids and 4 not in ids and 5 not in ids


def test_load_phoneme_ids_formats():
    text = "# comment\n1 a\n2 b\n3 \nx 4\n"
    table = load_phoneme_ids(io.StringIO(text))
    assert table == {"a": 1, "b": 2, " ": 3, "x": 4}


def test_load_phoneme_map():
    text = "# c\nab a b\nq \n"
    table = load_phoneme_map(io.StringIO(text))
    assert table["ab"] == ["a", "b"]
    assert table["q"] == [" "]


@requires_reference
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"include_whitespace": False, "blank_between": BlankBetween.WORDS},
        {"include_whitespace": False, "blank_between": BlankBetween.TOKENS},
        {"blank_between": BlankBetween.TOKENS_AND_WORDS},
        {"blank_at_start": False, "blank_at_end": False},
        {"bos_token": None, "eos_token": None},
        {"blank_token": None},
    ],
)
def test_parity_with_reference(kwargs):
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from phoonnx import phoneme_ids as ref
    finally:
        sys.path.remove(REFERENCE_PATH)

    cases = [
        list("həlˈoʊ wˈɝːld"),  # "hello world" IPA
        list("a"),
        list("  a  b  "),
        list("abc def ghi"),
        ["ˈ", "a", " ", "b"],
    ]
    for phonemes in cases:
        ref_kwargs = dict(kwargs)
        if "blank_between" in ref_kwargs:
            ref_kwargs["blank_between"] = ref.BlankBetween(
                ref_kwargs["blank_between"].value
            )
        assert phonemes_to_ids(list(phonemes), **kwargs) == ref.phonemes_to_ids(
            list(phonemes), **ref_kwargs
        ), (phonemes, kwargs)


@requires_reference
def test_default_map_parity():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from phoonnx import phoneme_ids as ref
    finally:
        sys.path.remove(REFERENCE_PATH)
    assert dict(DEFAULT_IPA_PHONEME_ID_MAP) == dict(ref.DEFAULT_IPA_PHONEME_ID_MAP)


@requires_reference
def test_compound_parity_mimic3_style():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from phoonnx import phoneme_ids as ref
    finally:
        sys.path.remove(REFERENCE_PATH)
    id_map = {"_": 0, "^": 1, "$": 2, " ": 3, "a": 4, "b": 5, "ab": 6,
              "abc": 7, "c": 8}
    for phonemes in (["a", "b", "c"], ["a", "b"], ["c", "a", "b", "c"]):
        for blank_between in BlankBetween:
            got = phonemes_to_ids(
                phonemes, id_map=id_map, blank_between=blank_between
            )
            want = ref.phonemes_to_ids(
                phonemes, id_map=id_map,
                blank_between=ref.BlankBetween(blank_between.value),
            )
            assert got == want


def test_missing_word_separator_does_not_crash():
    """include_whitespace=False + blank_between=WORDS with a word
    separator absent from the id map: warn and skip instead of KeyError
    (the reference crashes on every tokenization for such voices)."""
    id_map = {"_": 0, "^": 1, "$": 2, "a": 4, "b": 5}
    ids = phonemes_to_ids(
        ["a", " ", "b"], id_map,
        include_whitespace=False,
        blank_between=BlankBetween.WORDS,
        word_sep_token=" ",
    )
    # bos, blank@start, a, b (separator skipped with a warning),
    # blank@end, eos
    assert ids == [1, 0, 4, 5, 0, 2]


@requires_reference
def test_fuzz_parity_with_reference():
    """Randomized parity sweep: 600 seeded cases over flag combinations,
    compound symbols, and whitespace handling must tokenize identically
    to the reference (a 3000-case sweep was clean when this landed)."""
    import random
    import warnings

    sys.path.insert(0, REFERENCE_PATH)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from phoonnx.phoneme_ids import BlankBetween as RefBB
            from phoonnx.phoneme_ids import phonemes_to_ids as ref_fn
    finally:
        sys.path.remove(REFERENCE_PATH)

    rng = random.Random(0)
    symbols = list("abcdefghij") + ["tS", "dZ", "aI"]
    for _ in range(600):
        chosen = rng.sample(symbols, rng.randint(3, len(symbols)))
        id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
        id_map.update({s: i + 4 for i, s in enumerate(chosen)})
        phonemes = [rng.choice(chosen + [" "])
                    for _ in range(rng.randint(0, 12))]
        blank_between = rng.choice(
            ["tokens", "words", "tokens_and_words"])
        kwargs = dict(
            include_whitespace=rng.choice([True, False]),
            blank_at_start=rng.choice([True, False]),
            blank_at_end=rng.choice([True, False]),
            word_sep_token=" ",
            blank_token=rng.choice(["_", None]),
            bos_token=rng.choice(["^", None]),
            eos_token=rng.choice(["$", None]),
        )
        ref = ref_fn(phonemes, id_map,
                     blank_between=RefBB(blank_between), **kwargs)
        mine = phonemes_to_ids(phonemes, id_map,
                               blank_between=BlankBetween(blank_between),
                               **kwargs)
        assert mine == ref, (phonemes, blank_between, kwargs)
