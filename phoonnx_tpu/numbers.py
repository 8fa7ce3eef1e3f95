"""Self-contained number pronunciation backend.

The reference delegates number/fraction pronunciation to the external
``ovos-number-parser`` / ``unicode-rbnf`` packages (reference:
phoonnx/util.py:7-10). This module provides the same call surface
(:func:`pronounce_number`, :func:`pronounce_fraction`, :func:`is_numeric`)
with built-in cardinal/ordinal realisations for en/pt/es/fr/de/it/nl/gl/ca
and a digit-spelling fallback for other languages. If the ovos parsers are
installed they are preferred, keeping output identical to the reference.
"""

import logging
from typing import Union

LOG = logging.getLogger(__name__)

try:  # pragma: no cover - exercised only when ovos deps are installed
    from ovos_number_parser import pronounce_number as _ovos_pronounce_number
    from ovos_number_parser import pronounce_fraction as _ovos_pronounce_fraction

    _HAVE_OVOS = True
except ImportError:
    _HAVE_OVOS = False

try:  # pragma: no cover - exercised only when unicode-rbnf is installed
    from unicode_rbnf import FormatPurpose as _RbnfPurpose
    from unicode_rbnf import RbnfEngine as _RbnfEngine

    _HAVE_RBNF = True
except ImportError:
    _HAVE_RBNF = False

_RBNF_ENGINES: dict = {}


def _rbnf_pronounce(num: Union[int, float], lang_code: str):
    """CLDR rule-based verbalization for languages without a built-in
    backend (reference util.py:659-663 fallback chain). Returns None when
    unicode-rbnf is missing or has no rules for the language."""
    if not _HAVE_RBNF:
        return None
    engine = _RBNF_ENGINES.get(lang_code)
    if engine is None:
        try:
            engine = _RbnfEngine.for_language(lang_code)
        except Exception:
            engine = False
        _RBNF_ENGINES[lang_code] = engine
    if not engine:
        return None
    try:
        return engine.format_number(num, _RbnfPurpose.CARDINAL).text
    except Exception:  # pragma: no cover
        return None


def is_numeric(value: str) -> bool:
    """True if the string parses as a float (mirrors ovos is_numeric)."""
    try:
        float(value)
        return True
    except (ValueError, TypeError):
        return False


# ---------------------------------------------------------------------------
# English
# ---------------------------------------------------------------------------

_EN_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_EN_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_EN_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand")]

_EN_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _en_int(n: int) -> str:
    if n < 0:
        return "minus " + _en_int(-n)
    if n < 20:
        return _EN_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        return _EN_TENS[tens] + (" " + _EN_ONES[ones] if ones else "")
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        out = _EN_ONES[hundreds] + " hundred"
        return out + (" and " + _en_int(rest) if rest else "")
    for scale, name in _EN_SCALE:
        if n >= scale:
            major, rest = divmod(n, scale)
            out = _en_int(major) + " " + name
            if rest:
                joiner = " and " if rest < 100 else " "
                out += joiner + _en_int(rest)
            return out
    return str(n)


def _en_ordinal(n: int) -> str:
    words = _en_int(n)
    parts = words.rsplit(" ", 1)
    last = parts[-1]
    if "-" in last:
        head, tail = last.rsplit("-", 1)
        last = head + "-" + _EN_ORDINAL_SPECIAL.get(tail, tail + "th")
    elif last in _EN_ORDINAL_SPECIAL:
        last = _EN_ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    elif last.endswith("t"):
        last = last + "h"
    else:
        last = last + "th"
    parts[-1] = last
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Portuguese / Spanish / French / German (cardinals)
# ---------------------------------------------------------------------------

_PT_ONES = [
    "zero", "um", "dois", "três", "quatro", "cinco", "seis", "sete", "oito",
    "nove", "dez", "onze", "doze", "treze", "catorze", "quinze", "dezasseis",
    "dezassete", "dezoito", "dezanove",
]
_PT_TENS = ["", "", "vinte", "trinta", "quarenta", "cinquenta", "sessenta",
            "setenta", "oitenta", "noventa"]
_PT_HUNDREDS = ["", "cento", "duzentos", "trezentos", "quatrocentos",
                "quinhentos", "seiscentos", "setecentos", "oitocentos",
                "novecentos"]


def _pt_int(n: int) -> str:
    if n < 0:
        return "menos " + _pt_int(-n)
    if n < 20:
        return _PT_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        return _PT_TENS[tens] + (" e " + _PT_ONES[ones] if ones else "")
    if n == 100:
        return "cem"
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        out = _PT_HUNDREDS[hundreds]
        return out + (" e " + _pt_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mil" if thousands == 1 else _pt_int(thousands) + " mil"
        if not rest:
            return head
        joiner = " e " if rest < 100 or rest % 100 == 0 else " "
        return head + joiner + _pt_int(rest)
    if n < 10 ** 9:
        millions, rest = divmod(n, 10 ** 6)
        head = "um milhão" if millions == 1 else _pt_int(millions) + " milhões"
        return head + (" e " + _pt_int(rest) if rest else "")
    billions, rest = divmod(n, 10 ** 9)
    head = ("mil milhões" if billions == 1
            else _pt_int(billions) + " mil milhões")
    return head + (" e " + _pt_int(rest) if rest else "")


_ES_ONES = [
    "cero", "uno", "dos", "tres", "cuatro", "cinco", "seis", "siete", "ocho",
    "nueve", "diez", "once", "doce", "trece", "catorce", "quince",
    "dieciséis", "diecisiete", "dieciocho", "diecinueve", "veinte",
    "veintiuno", "veintidós", "veintitrés", "veinticuatro", "veinticinco",
    "veintiséis", "veintisiete", "veintiocho", "veintinueve",
]
_ES_TENS = ["", "", "", "treinta", "cuarenta", "cincuenta", "sesenta",
            "setenta", "ochenta", "noventa"]
_ES_HUNDREDS = ["", "ciento", "doscientos", "trescientos", "cuatrocientos",
                "quinientos", "seiscientos", "setecientos", "ochocientos",
                "novecientos"]


def _es_int(n: int) -> str:
    if n < 0:
        return "menos " + _es_int(-n)
    if n < 30:
        return _ES_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        return _ES_TENS[tens] + (" y " + _ES_ONES[ones] if ones else "")
    if n == 100:
        return "cien"
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        return _ES_HUNDREDS[hundreds] + (" " + _es_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mil" if thousands == 1 else _es_int(thousands) + " mil"
        return head + (" " + _es_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = "un millón" if millions == 1 else _es_int(millions) + " millones"
    return head + (" " + _es_int(rest) if rest else "")


_FR_ONES = [
    "zéro", "un", "deux", "trois", "quatre", "cinq", "six", "sept", "huit",
    "neuf", "dix", "onze", "douze", "treize", "quatorze", "quinze", "seize",
    "dix-sept", "dix-huit", "dix-neuf",
]
_FR_TENS = ["", "", "vingt", "trente", "quarante", "cinquante", "soixante"]


def _fr_int(n: int) -> str:
    if n < 0:
        return "moins " + _fr_int(-n)
    if n < 20:
        return _FR_ONES[n]
    if n < 70:
        tens, ones = divmod(n, 10)
        if ones == 1:
            return _FR_TENS[tens] + " et un"
        return _FR_TENS[tens] + ("-" + _FR_ONES[ones] if ones else "")
    if n < 80:
        rest = n - 60
        if rest == 11:
            return "soixante et onze"
        return "soixante-" + _FR_ONES[rest]
    if n < 100:
        rest = n - 80
        if rest == 0:
            return "quatre-vingts"
        return "quatre-vingt-" + _FR_ONES[rest] if rest < 20 else (
            "quatre-vingt-" + _fr_int(rest))
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        head = "cent" if hundreds == 1 else _FR_ONES[hundreds] + " cent"
        if hundreds > 1 and rest == 0:
            head += "s"
        return head + (" " + _fr_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mille" if thousands == 1 else _fr_int(thousands) + " mille"
        return head + (" " + _fr_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = "un million" if millions == 1 else _fr_int(millions) + " millions"
    return head + (" " + _fr_int(rest) if rest else "")


_DE_ONES = [
    "null", "eins", "zwei", "drei", "vier", "fünf", "sechs", "sieben", "acht",
    "neun", "zehn", "elf", "zwölf", "dreizehn", "vierzehn", "fünfzehn",
    "sechzehn", "siebzehn", "achtzehn", "neunzehn",
]
_DE_TENS = ["", "", "zwanzig", "dreißig", "vierzig", "fünfzig", "sechzig",
            "siebzig", "achtzig", "neunzig"]


def _de_int(n: int) -> str:
    if n < 0:
        return "minus " + _de_int(-n)
    if n < 20:
        return _DE_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        if ones:
            one = "ein" if ones == 1 else _DE_ONES[ones]
            return one + "und" + _DE_TENS[tens]
        return _DE_TENS[tens]
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        head = ("ein" if hundreds == 1 else _DE_ONES[hundreds]) + "hundert"
        return head + (_de_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = ("ein" if thousands == 1 else _de_int(thousands)) + "tausend"
        return head + (_de_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = ("eine Million" if millions == 1
            else _de_int(millions) + " Millionen")
    return head + (" " + _de_int(rest) if rest else "")


_IT_ONES = [
    "zero", "uno", "due", "tre", "quattro", "cinque", "sei", "sette",
    "otto", "nove", "dieci", "undici", "dodici", "tredici", "quattordici",
    "quindici", "sedici", "diciassette", "diciotto", "diciannove",
]
_IT_TENS = ["", "", "venti", "trenta", "quaranta", "cinquanta", "sessanta",
            "settanta", "ottanta", "novanta"]


def _it_int(n: int) -> str:
    if n < 0:
        return "meno " + _it_int(-n)
    if n < 20:
        return _IT_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        stem = _IT_TENS[tens]
        if ones in (1, 8):  # elision: ventuno, ventotto
            stem = stem[:-1]
        return stem + (_IT_ONES[ones] if ones else "")
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        head = ("cento" if hundreds == 1 else _IT_ONES[hundreds] + "cento")
        return head + (_it_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mille" if thousands == 1 else _it_int(thousands) + "mila"
        return head + (_it_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = ("un milione" if millions == 1
            else _it_int(millions) + " milioni")
    return head + (" " + _it_int(rest) if rest else "")


_NL_ONES = [
    "nul", "een", "twee", "drie", "vier", "vijf", "zes", "zeven", "acht",
    "negen", "tien", "elf", "twaalf", "dertien", "veertien", "vijftien",
    "zestien", "zeventien", "achttien", "negentien",
]
_NL_TENS = ["", "", "twintig", "dertig", "veertig", "vijftig", "zestig",
            "zeventig", "tachtig", "negentig"]


def _nl_int(n: int) -> str:
    if n < 0:
        return "min " + _nl_int(-n)
    if n < 20:
        return _NL_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        if ones:
            joiner = "ën" if _NL_ONES[ones].endswith("e") else "en"
            return _NL_ONES[ones] + joiner + _NL_TENS[tens]
        return _NL_TENS[tens]
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        head = ("honderd" if hundreds == 1
                else _NL_ONES[hundreds] + "honderd")
        return head + (_nl_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = ("duizend" if thousands == 1
                else _nl_int(thousands) + "duizend")
        return head + (" " + _nl_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = ("een miljoen" if millions == 1
            else _nl_int(millions) + " miljoen")
    return head + (" " + _nl_int(rest) if rest else "")


_GL_ONES = [
    "cero", "un", "dous", "tres", "catro", "cinco", "seis", "sete", "oito",
    "nove", "dez", "once", "doce", "trece", "catorce", "quince", "dezaseis",
    "dezasete", "dezaoito", "dezanove", "vinte", "vinte e un", "vinte e dous",
    "vinte e tres", "vinte e catro", "vinte e cinco", "vinte e seis",
    "vinte e sete", "vinte e oito", "vinte e nove",
]
_GL_TENS = ["", "", "", "trinta", "corenta", "cincuenta", "sesenta",
            "setenta", "oitenta", "noventa"]
_GL_HUNDREDS = ["", "cento", "douscentos", "trescentos", "catrocentos",
                "cincocentos", "seiscentos", "setecentos", "oitocentos",
                "novecentos"]


def _gl_int(n: int) -> str:
    """Galician cardinals (tens join units with 'e': 'corenta e dous')."""
    if n < 0:
        return "menos " + _gl_int(-n)
    if n < 30:
        return _GL_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        return _GL_TENS[tens] + (" e " + _GL_ONES[ones] if ones else "")
    if n == 100:
        return "cen"
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        return _GL_HUNDREDS[hundreds] + (" " + _gl_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mil" if thousands == 1 else _gl_int(thousands) + " mil"
        return head + (" " + _gl_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = "un millón" if millions == 1 else _gl_int(millions) + " millóns"
    return head + (" " + _gl_int(rest) if rest else "")


_CA_ONES = [
    "zero", "un", "dos", "tres", "quatre", "cinc", "sis", "set", "vuit",
    "nou", "deu", "onze", "dotze", "tretze", "catorze", "quinze", "setze",
    "disset", "divuit", "dinou",
]
_CA_TENS = ["", "", "vint", "trenta", "quaranta", "cinquanta", "seixanta",
            "setanta", "vuitanta", "noranta"]
_CA_HUNDREDS = ["", "cent", "dos-cents", "tres-cents", "quatre-cents",
                "cinc-cents", "sis-cents", "set-cents", "vuit-cents",
                "nou-cents"]


def _ca_int(n: int) -> str:
    """Catalan cardinals ('vint-i-dos', 'trenta-un', 'dos-cents')."""
    if n < 0:
        return "menys " + _ca_int(-n)
    if n < 20:
        return _CA_ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        if not ones:
            return _CA_TENS[tens]
        joiner = "-i-" if tens == 2 else "-"
        return _CA_TENS[tens] + joiner + _CA_ONES[ones]
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        return _CA_HUNDREDS[hundreds] + (" " + _ca_int(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        head = "mil" if thousands == 1 else _ca_int(thousands) + " mil"
        return head + (" " + _ca_int(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = "un milió" if millions == 1 else _ca_int(millions) + " milions"
    return head + (" " + _ca_int(rest) if rest else "")


_INT_BACKENDS = {"en": _en_int, "pt": _pt_int, "es": _es_int, "fr": _fr_int,
                 "de": _de_int, "it": _it_int, "nl": _nl_int, "gl": _gl_int,
                 "ca": _ca_int}
_DECIMAL_POINT = {"en": "point", "pt": "vírgula", "es": "coma", "fr": "virgule",
                  "de": "Komma", "it": "virgola", "nl": "komma", "gl": "coma",
                  "ca": "coma"}
_MINUS = {"en": "minus", "pt": "menos", "es": "menos", "fr": "moins",
          "de": "minus", "it": "meno", "nl": "min", "gl": "menos",
          "ca": "menys"}


def spell_digits(digits: str, lang: str) -> str:
    """Spell a digit string one digit at a time ('123' -> 'one two three')."""
    lang = lang.split("-")[0]
    backend = _INT_BACKENDS.get(lang, _en_int)
    return " ".join(backend(int(d)) for d in digits if d.isdigit())


def pronounce_number(num: Union[int, float], lang: str = "en") -> str:
    """Cardinal realisation of a number (mirrors ovos pronounce_number)."""
    if _HAVE_OVOS:  # pragma: no cover
        try:
            return _ovos_pronounce_number(num, lang=lang)
        except Exception:
            pass

    lang_code = lang.split("-")[0]
    backend = _INT_BACKENDS.get(lang_code)
    if backend is None:
        rbnf = _rbnf_pronounce(num, lang_code)
        if rbnf is not None:
            return rbnf
        # No wordings for this language: keep the numeral unchanged.
        return str(num)

    if isinstance(num, float) and not num.is_integer():
        text = repr(abs(num))
        int_part, frac_part = text.split(".")
        words = backend(int(int_part))
        point = _DECIMAL_POINT.get(lang_code, "point")
        frac_words = " ".join(backend(int(d)) for d in frac_part)
        out = f"{words} {point} {frac_words}"
        if num < 0:
            out = f"{_MINUS.get(lang_code, 'minus')} {out}"
        return out
    return backend(int(num))


_EN_FRACTION_NAMES = {2: "half", 3: "third", 4: "quarter"}


def pronounce_fraction(fraction: str, lang: str = "en") -> str:
    """Realise 'N/M' as words (mirrors ovos pronounce_fraction)."""
    if _HAVE_OVOS:  # pragma: no cover
        try:
            return _ovos_pronounce_fraction(fraction, lang)
        except Exception:
            pass

    numerator_str, denominator_str = fraction.split("/")
    numerator, denominator = int(numerator_str), int(denominator_str)
    lang_code = lang.split("-")[0]

    if lang_code == "en":
        if denominator in _EN_FRACTION_NAMES:
            name = _EN_FRACTION_NAMES[denominator]
            if denominator == 2:
                unit = "half" if numerator == 1 else "halves"
            else:
                unit = name if numerator == 1 else name + "s"
        else:
            unit = _en_ordinal(denominator)
            if numerator != 1:
                unit += "s"
        article = "a" if numerator == 1 else _en_int(numerator)
        return f"{article} {unit}" if numerator == 1 else f"{_en_int(numerator)} {unit}"

    backend = _INT_BACKENDS.get(lang_code, _en_int)
    over = {"pt": "sobre", "es": "sobre", "fr": "sur", "de": "durch"}.get(
        lang_code, "over")
    return f"{backend(numerator)} {over} {backend(denominator)}"


def pronounce_ordinal(n: int, lang: str = "en") -> str:
    """Ordinal words; only English has a dedicated realisation."""
    if lang.split("-")[0] == "en":
        return _en_ordinal(n)
    return pronounce_number(n, lang)


def pronounce_year(year: int, lang: str = "en") -> str:
    """Year realisation ('1984' -> 'nineteen eighty four' in English)."""
    lang_code = lang.split("-")[0]
    if lang_code == "en" and 1000 <= year <= 9999:
        high, low = divmod(year, 100)
        if low == 0:
            if high % 10 == 0:
                return _en_int(year)
            return _en_int(high) + " hundred"
        if year >= 2000 and year < 2010:
            return _en_int(year)
        if low < 10:
            return _en_int(high) + " oh " + _en_int(low)
        return _en_int(high) + " " + _en_int(low)
    return pronounce_number(year, lang)
