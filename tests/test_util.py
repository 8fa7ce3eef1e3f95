"""Text normalizer unit tests (self-contained backends)."""

from phoonnx_tpu.numbers import (
    pronounce_fraction,
    pronounce_number,
    pronounce_year,
)
from phoonnx_tpu.util import is_fraction, normalize


def test_contractions():
    assert normalize("I'm here", "en") == "I am here"
    assert normalize("don't stop", "en") == "do not stop"
    assert normalize("can't won't", "en") == "can not will not"


def test_titles():
    assert normalize("Dr. Smith", "en") == "Doctor Smith"
    assert normalize("Mr. Jones and Prof. Lee", "en") == (
        "Mister Jones and Professor Lee"
    )
    assert normalize("Sr. Silva", "pt") == "Senhor Silva"


def test_numbers_en():
    assert pronounce_number(0, "en") == "zero"
    assert pronounce_number(13, "en") == "thirteen"
    assert pronounce_number(42, "en") == "forty two"
    assert pronounce_number(100, "en") == "one hundred"
    assert pronounce_number(101, "en") == "one hundred and one"
    assert pronounce_number(1234, "en") == (
        "one thousand two hundred and thirty four"
    )
    assert pronounce_number(1000000, "en") == "one million"
    assert pronounce_number(2.5, "en") == "two point five"
    assert pronounce_number(-7, "en") == "minus seven"


def test_numbers_in_text():
    assert normalize("I have 3 cats", "en") == "I have three cats"
    assert normalize("It costs 2.5 now", "en") == "It costs two point five now"


def test_fractions():
    assert is_fraction("3/4")
    assert not is_fraction("3/4/5")
    assert not is_fraction("a/b")
    assert pronounce_fraction("1/2", "en") == "a half"
    assert pronounce_fraction("3/4", "en") == "three quarters"
    assert pronounce_fraction("2/5", "en") == "two fifths"
    assert "1/2" not in normalize("The fraction is 1/2", "en")


def test_units_en():
    out = normalize("5kg of flour", "en")
    assert out == "five kilograms of flour"
    out = normalize("The temperature is 25°C", "en")
    assert out == "The temperature is twenty five degrees celsius"
    out = normalize("50% done", "en")
    assert out == "fifty per cent done"


def test_units_ordinal_indicator():
    # 'º' (masculine ordinal) folds into '°'
    out = normalize("25ºC hoje", "pt")
    assert "graus" in out


def test_units_pt_decimal_comma():
    out = normalize("1,5kg", "pt")
    assert out == "um vírgula cinco quilogramas"


def test_hyphen_digit():
    assert normalize("sub-23 team", "en") == "sub twenty three team"


def test_military_time():
    out = normalize("at 19h30 sharp", "en")
    assert "nineteen thirty" in out
    out = normalize("às 14h30", "pt")
    assert "catorze e trinta" in out


def test_ampm_time():
    out = normalize("meet at 10am", "en-US")
    assert "A M" in out


def test_dates_mdy_vs_dmy():
    out_us = normalize("on 08/03/2025", "en-US")
    # MDY: August 3rd
    assert "august" in out_us
    out_gb = normalize("on 08/03/2025", "en-GB")
    # DMY: March 8th
    assert "march" in out_gb


def test_date_unambiguous_day():
    # 15 can only be a day even in MDY locales
    out = normalize("due 15/05/2025", "en-US")
    assert "may" in out


def test_years():
    assert pronounce_year(1984, "en") == "nineteen eighty four"
    assert pronounce_year(2025, "en") == "twenty twenty five"
    assert pronounce_year(2000, "en") == "two thousand"
    assert pronounce_year(1900, "en") == "nineteen hundred"


def test_unknown_lang_passthrough():
    # No number backend: numerals survive unchanged
    assert normalize("42 things", "xx") == "42 things"
