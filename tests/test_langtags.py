"""Language tag matching + sentence tokenizer tests."""

import pytest

from phoonnx_tpu.langtags import closest_match, match_lang, parse_tag, tag_distance
from phoonnx_tpu.sentences import sentence_tokenize


def test_parse():
    tag = parse_tag("pt_BR")
    assert tag.language == "pt"
    assert tag.region == "br"
    assert parse_tag("zh-Hans-CN").script == "hans"
    assert parse_tag("iw").language == "he"  # legacy alias


def test_distance():
    assert tag_distance("en", "en") == 0
    assert 0 < tag_distance("en", "en-US") <= 10
    assert 0 < tag_distance("en-GB", "en-US") <= 10
    assert tag_distance("en", "fr") > 10
    assert tag_distance("zh", "cmn") <= 10  # macrolanguage


def test_closest_match():
    best, distance = closest_match("en-US", ["en", "fr", "de"])
    assert best == "en" and distance <= 10
    best, distance = closest_match("pt-BR", ["pt-PT", "pt", "es"])
    assert best == "pt"


def test_match_lang():
    assert match_lang("en", ["en", "fr"]) == "en"
    assert match_lang("en-US", ["en-GB", "fr"]) == "en-GB"
    with pytest.raises(ValueError):
        match_lang("ja", ["en", "fr"])


def test_sentences_basic():
    out = sentence_tokenize("Hello world. How are you? Fine!")
    assert out == ["Hello world.", "How are you?", "Fine!"]


def test_sentences_abbreviations():
    out = sentence_tokenize("Dr. Smith arrived. He sat down.")
    assert out == ["Dr. Smith arrived.", "He sat down."]


def test_sentences_decimal():
    out = sentence_tokenize("Pi is 3.14 exactly. Really.")
    assert out == ["Pi is 3.14 exactly.", "Really."]


def test_sentences_no_terminator():
    assert sentence_tokenize("no punctuation here") == ["no punctuation here"]
    assert sentence_tokenize("") == []


def test_iso639_3_equivalence():
    """3-letter (terminological AND bibliographic) codes must match their
    2-letter equivalents — Charsiu/Epitran inventories use them."""
    from phoonnx_tpu.langtags import tag_distance

    assert tag_distance("en-US", "eng-us") == 0
    assert tag_distance("es", "spa") == 0
    assert tag_distance("de", "ger") == 0  # bibliographic
    assert tag_distance("cs", "cze") == 0
    assert tag_distance("ja", "jav") == 1000  # Javanese is NOT Japanese


def test_charsiu_epitran_lang_resolution():
    from phoonnx_tpu.phonemizers.mul import (
        CharsiuPhonemizer,
        EpitranPhonemizer,
    )

    assert CharsiuPhonemizer.get_lang("en-US") == "eng-us"
    assert CharsiuPhonemizer.get_lang("es") == "spa"
    assert CharsiuPhonemizer.get_lang("hy") == "arm-e"
    # with the reference's verbatim inventory order, 'ja' ties across
    # the jpn-* scripts and resolves to the first entry like the
    # reference itself does
    assert EpitranPhonemizer.get_lang("ja").startswith("jpn-")
    assert EpitranPhonemizer.get_lang("es") == "spa-Latn"
    assert EpitranPhonemizer.get_lang("ml") == "mal-Mlym"
    assert EpitranPhonemizer.get_lang("mr") == "mar-Deva"
