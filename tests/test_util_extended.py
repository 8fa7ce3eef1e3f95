"""Extended normalizer battery mirroring the reference's test_util.py scope
(separators, fractions, dates/times, units, contractions) plus the Arabic
phonemizer surface from test_ar.py (alphabet validation, get_lang tables)."""

import pytest

from phoonnx_tpu.config import Alphabet
from phoonnx_tpu.util import CONTRACTIONS, TITLES, UNITS, normalize


# ---------------------------------------------------------------------------
# Number separators
# ---------------------------------------------------------------------------


def test_en_thousands_separator():
    assert normalize("1,234 items", "en") == (
        "one thousand two hundred and thirty four items"
    )


def test_pt_thousands_separator():
    out = normalize("1.234 itens", "pt")
    assert out == "mil duzentos e trinta e quatro itens"


def test_pt_mixed_separators():
    # 123.456,78 -> 123456.78
    out = normalize("O lucro foi de 123.456,78", "pt")
    assert "cento e vinte e três mil" in out
    assert "vírgula" in out


def test_en_decimal():
    assert normalize("exactly 0.5 left", "en") == (
        "exactly zero point five left"
    )


# ---------------------------------------------------------------------------
# Contractions: every table entry must expand
# ---------------------------------------------------------------------------


def test_all_contractions_expand():
    for contraction, expansion in CONTRACTIONS["en"].items():
        out = normalize(f"x {contraction} x", "en")
        assert expansion in out, contraction


def test_contraction_exact_token_only():
    # no substring expansion inside other words
    assert normalize("cantata", "en") == "cantata"


# ---------------------------------------------------------------------------
# Titles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("lang", sorted(TITLES))
def test_titles_expand(lang):
    for title, expansion in TITLES[lang].items():
        out = normalize(f"{title} X", lang)
        assert expansion in out, (lang, title)


# ---------------------------------------------------------------------------
# Units
# ---------------------------------------------------------------------------


def test_units_symbolic_no_space():
    assert normalize("100%", "en") == "one hundred per cent"
    assert normalize("12€", "en") == "twelve euros"


def test_units_with_space():
    assert normalize("5 km away", "en") == "five kilometers away"


def test_units_decimal_value():
    assert normalize("1.5L bottle", "en") == "one point five liters bottle"


def test_units_de():
    assert normalize("10kg Mehl", "de") == "zehn Kilogramm Mehl"


def test_units_fr():
    assert normalize("10km de route", "fr") == "dix kilomètres de route"


@pytest.mark.parametrize("lang", sorted(UNITS))
def test_percent_all_locales(lang):
    out = normalize("50%", lang)
    assert "%" not in out
    assert "50" not in out


# ---------------------------------------------------------------------------
# Dates / times
# ---------------------------------------------------------------------------


def test_date_four_digit_year_first():
    # YYYY/A/B parses A as day, B as month (reference behavior,
    # util.py:494-522: the remaining parts go through the DMY branch)
    out = normalize("on 2025/03/08", "en-GB")
    assert "twenty twenty five" in out
    assert "august" in out


def test_date_two_digit_year():
    out = normalize("on 08/03/99", "en-GB")
    assert "nineteen ninety nine" in out


def test_invalid_date_left_alone():
    out = normalize("version 99/99/99 tag", "en")
    assert "99/99/99" in out


def test_time_minutes_under_ten():
    out = normalize("at 9h05", "en")
    assert "nine oh five" in out


def test_fraction_in_sentence():
    out = normalize("add 3/4 cup", "en")
    assert out == "add three quarters cup"


def test_hyphen_word_number():
    assert normalize("sub-23", "pt") == "sub vinte e três"


# ---------------------------------------------------------------------------
# Arabic phonemizer surface (reference test_ar.py scope)
# ---------------------------------------------------------------------------


def test_galician_numbers_and_dates():
    from phoonnx_tpu.numbers import pronounce_number

    assert pronounce_number(42, "gl") == "corenta e dous"
    assert pronounce_number(100, "gl") == "cen"
    assert (pronounce_number(1995, "gl")
            == "mil novecentos noventa e cinco")
    assert pronounce_number(2000000, "gl") == "dous millóns"
    out = normalize("Teño 25 anos, desde o 08/03/1995.", "gl")
    assert "vinte e cinco" in out
    assert "oito de marzo de mil novecentos noventa e cinco" in out


def test_catalan_numbers_and_dates():
    from phoonnx_tpu.numbers import pronounce_number

    assert pronounce_number(22, "ca") == "vint-i-dos"
    assert pronounce_number(31, "ca") == "trenta-un"
    assert pronounce_number(531, "ca") == "cinc-cents trenta-un"
    assert pronounce_number(-3, "ca") == "menys tres"
    out = normalize("Tinc 22 anys, nascut el 08/03/1995.", "ca")
    assert "vint-i-dos" in out
    assert "vuit de març de mil nou-cents noranta-cinc" in out


def test_units_case_insensitive_lookup():
    """The unit pattern matches case-insensitively, so the table lookup
    must too (the reference crashes with KeyError on '10 KM')."""
    assert normalize("It is 10 KM away", "en") == \
        "It is ten kilometers away"
    assert "degrees celsius" in normalize("water boils at 100 °c", "en")


def test_comma_decimal_locales_extended():
    """it/nl/gl/ca are comma-decimal; the separator table must cover
    every locale with a number backend, else '3,14' parses as 314."""
    assert "tres coma un quatre" in normalize("són 3,14 metres", "ca")
    assert "dous coma cinco" in normalize("custa 2,5 euros", "gl")
    out_it = normalize("sono 3,5 metri", "it")
    assert "trecentocinque" not in out_it.replace(" ", "")
    assert "virgola" in out_it


def test_sentence_tokenizer_boundaries():
    from phoonnx_tpu.sentences import sentence_tokenize

    assert sentence_tokenize("I said no. He left.") == \
        ["I said no.", "He left."]
    assert sentence_tokenize("This is plan B. Next we go.") == \
        ["This is plan B.", "Next we go."]
    assert sentence_tokenize("John J. Smith spoke.") == \
        ["John J. Smith spoke."]
    assert sentence_tokenize("See no. 5 for details.") == \
        ["See no. 5 for details."]


def test_rbnf_fallback_chain():
    """Languages without a built-in backend go through unicode-rbnf when
    installed (reference util.py:659-663), else keep the numeral."""
    import types
    import unittest.mock as mock

    import phoonnx_tpu.numbers as nums

    assert nums.pronounce_number(7, "xx") == "7"
    fake = types.SimpleNamespace(
        format_number=lambda n, p: types.SimpleNamespace(text="sieben"))
    with mock.patch.object(nums, "_HAVE_RBNF", True), \
            mock.patch.object(nums, "_RBNF_ENGINES", {"xx": fake}), \
            mock.patch.object(nums, "_RbnfPurpose",
                              types.SimpleNamespace(CARDINAL=1),
                              create=True):
        assert nums.pronounce_number(7, "xx") == "sieben"


def test_mantoq_alphabet_validation():
    from phoonnx_tpu.phonemizers.ar import MantoqPhonemizer

    assert MantoqPhonemizer(Alphabet.BUCKWALTER).alphabet == \
        Alphabet.BUCKWALTER
    assert MantoqPhonemizer(Alphabet.IPA).alphabet == Alphabet.IPA
    with pytest.raises(ValueError):
        MantoqPhonemizer(Alphabet.HANGUL)


@pytest.mark.parametrize("accepted", ["ar", "ar-SA", "ar-EG", "arb"])
def test_mantoq_get_lang_accepts(accepted):
    from phoonnx_tpu.phonemizers.ar import MantoqPhonemizer

    assert MantoqPhonemizer.get_lang(accepted) == "ar"


@pytest.mark.parametrize("rejected", ["en", "he", "fa", "zz"])
def test_mantoq_get_lang_rejects(rejected):
    from phoonnx_tpu.phonemizers.ar import MantoqPhonemizer

    with pytest.raises(ValueError):
        MantoqPhonemizer.get_lang(rejected)


def test_mantoq_phonemize_buckwalter_vs_ipa():
    from phoonnx_tpu.phonemizers.ar import MantoqPhonemizer

    text = "مرحبا"
    bw = MantoqPhonemizer(Alphabet.BUCKWALTER).phonemize_string(text, "ar")
    ipa = MantoqPhonemizer(Alphabet.IPA).phonemize_string(text, "ar")
    assert bw != ipa
    assert "ħ" in ipa  # Haa' mapped to IPA
    assert "H" in bw   # stays Buckwalter


def test_consecutive_initials_stay_one_sentence():
    from phoonnx_tpu.sentences import sentence_tokenize

    assert sentence_tokenize("J. R. Smith said hi. Then left.") == \
        ["J. R. Smith said hi.", "Then left."]
    assert sentence_tokenize("J. R. R. Tolkien wrote it.") == \
        ["J. R. R. Tolkien wrote it."]
