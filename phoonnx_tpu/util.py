"""Locale-aware text normalization for the TTS front-end.

TPU-native rebuild of the reference normalizer (phoonnx/util.py:638-668):
expands dates, times, numbers, fractions, units, contractions and titles
before phonemization. All processing is host-side string work; pronunciation
backends live in :mod:`phoonnx_tpu.numbers` / :mod:`phoonnx_tpu.dates`.

Pipeline (identical order to the reference): dates/times -> word-hyphen-digit
-> units -> per-word (contractions, titles, fractions, numbers).
"""

import datetime
import logging
import re
import string
from datetime import date
from typing import Dict, Optional, Tuple

from phoonnx_tpu.dates import nice_date, nice_time
from phoonnx_tpu.numbers import (
    is_numeric,
    pronounce_fraction,
    pronounce_number,
    spell_digits,
)

LOG = logging.getLogger("phoonnx_tpu.normalize")


def _parse_table(block: str) -> Dict[str, str]:
    """Parse ``key => value`` lines into a dict."""
    table = {}
    for line in block.strip().splitlines():
        key, _, value = line.partition("=>")
        table[key.strip()] = value.strip()
    return table


# English contraction expansion (same coverage as reference util.py:16-186).
_EN_CONTRACTIONS = _parse_table("""
I'd => I would
I'll => I will
I'm => I am
I've => I have
I'm'a => I am going to
I'm'o => I am going to
I'll've => I will have
I'd've => I would have
Whatcha => What are you
ain't => is not
amn't => am not
aren't => are not
'cause => because
can't => can not
can't've => cannot have
could've => could have
couldn't => could not
couldn't've => could not have
daren't => dare not
daresn't => dare not
dasn't => dare not
didn't => did not
doesn't => does not
don't => do not
everyone's => everyone is
gimme => give me
gonna => going to
gon't => go not
gotta => got to
hadn't => had not
hadn't've => had not have
hasn't => has not
haven't => have not
he'd => he would
he'd've => he would have
he'll => he will
he'll've => he will have
he's => he is
he've => he would have
here's => here is
how'd => how did
how'd'y => how do you do
how'll => how will
how're => how are
how's => how is
howd'y => how do you do
howdy => how do you do
isn't => is not
it'd => it would
it'd've => it would have
it'll => it will
it'll've => it will have
it's => it is
'tis => it is
'twas => it was
kinda => kind of
let's => let us
ma'am => madam
may've => may have
mayn't => may not
might've => might have
mightn't => might not
mightn't've => might not have
must've => must have
mustn't => must not
mustn't've => must not have
needn't => need not
needn't've => need not have
ol' => old
oughtn't => ought not
oughtn't've => ought not have
sha'n't => shall not
shan't => shall not
shalln't => shall not
shan't've => shall not have
she'd => she would
she'd've => she would have
she'll => she will
she's => she is
should've => should have
shouldn't => should not
shouldn't've => should not have
so've => so have
so's => so is
somebody's => somebody is
someone'd => someone would
someone'll => someone will
someone's => someone is
something's => something is
that'd => that would
that'd've => that would have
that'll => that will
that're => that are
that's => that is
there'd => there would
there'd've => there would have
there'll => there will
there're => there are
there's => there is
these're => these are
they'd => they would
they'd've => they would have
they'll => they will
they'll've => they will have
they're => they are
they've => they have
this'd => this would
this'll => this will
this's => this is
those're => those are
to've => to have
wanna => want to
wasn't => was not
we'd => we would
we'd've => we would have
we'll => we will
we'll've => we will have
we're => we are
we've => we have
weren't => were not
what'd => what did
what'll => what will
what'll've => what will have
what're => what are
what's => what is
what've => what have
whats => what is
when'd => when did
when's => when is
when've => when have
where'd => where did
where're => where are
where's => where is
where've => where have
which's => which is
who'd => who would
who'd've => who would have
who'll => who will
who'll've => who will have
who're => who are
who's => who is
who've => who have
why'd => why did
why're => why are
why's => why is
why've => why have
will've => will have
won't => will not
won't've => will not have
would've => would have
wouldn't => would not
wouldn't've => would not have
y'ain't => you are not
y'aint => you are not
y'all => you all
y'all're => you all are
y'all've => you all have
y'all'd => you all would
y'all'd've => you all would have
ya'll => you all
you'd => you would
you'd've => you would have
you'll => you will
you'll've => you will have
you're => you are
you've => you have
""")

CONTRACTIONS: Dict[str, Dict[str, str]] = {"en": _EN_CONTRACTIONS}

# Honorific/title expansions per language (reference util.py:189-254).
TITLES: Dict[str, Dict[str, str]] = {
    "en": _parse_table("Dr. => Doctor\nMr. => Mister\nProf. => Professor"),
    "ca": _parse_table(
        "Dr. => Doctor\nSr. => Senyor\nSra. => Senyora\nProf. => Professor"),
    "es": _parse_table(
        "Dr. => Doctor\nSr. => Señor\nSra. => Señora\nProf. => Profesor\n"
        "D. => Don\nDña. => Doña"),
    "pt": _parse_table(
        "Dr. => Doutor\nSr. => Senhor\nSra. => Senhora\nProf. => Professor\n"
        "Drª. => Doutora\nEng. => Engenheiro\nD. => Dom\nDª => Dona"),
    "gl": _parse_table(
        "Dr. => Doutor\nSr. => Señor\nSra. => Señora\nProf. => Profesor\n"
        "Srta. => Señorita"),
    "fr": _parse_table(
        "Dr. => Docteur\nM. => Monsieur\nMme => Madame\nMlle => Mademoiselle\n"
        "Prof. => Professeur\nPr. => Professeur"),
    "it": _parse_table(
        "Dr. => Dottore\nSig. => Signore\nSig.ra => Signora\n"
        "Prof. => Professore\nDott.ssa => Dottoressa\nSig.na => Signorina"),
    "nl": _parse_table(
        "Dr. => Dokter\nDhr. => De Heer\nMevr. => Mevrouw\n"
        "Prof. => Professor\nDrs. => Dokterandus\nIng. => Ingenieur"),
    "de": _parse_table("Dr. => Doktor\nProf. => Professor"),
}

# Unit symbol -> spoken unit per language (reference util.py:256-359).
UNITS: Dict[str, Dict[str, str]] = {
    "en": _parse_table(
        "€ => euros\n% => per cent\n°C => degrees celsius\n"
        "°F => degrees fahrenheit\n°K => degrees kelvin\n° => degrees\n"
        "$ => dollars\n£ => pounds\nkm => kilometers\nm => meters\n"
        "cm => centimeters\nmm => millimeters\nft => feet\nin => inches\n"
        "yd => yards\nmi => miles\nkg => kilograms\ng => grams\n"
        "lb => pounds\noz => ounces\nL => liters\nmL => milliliters\n"
        "gal => gallons\nqt => quarts\npt => pints\nhr => hours\n"
        "min => minutes\ns => seconds"),
    "pt": _parse_table(
        "€ => euros\n% => por cento\n°C => graus celsius\n"
        "°F => graus fahrenheit\n°K => graus kelvin\n° => graus\n"
        "$ => dólares\n£ => libras\nkm => quilômetros\nm => metros\n"
        "cm => centímetros\nmm => milímetros\nkg => quilogramas\n"
        "g => gramas\nL => litros\nmL => mililitros\nh => horas\n"
        "min => minutos\ns => segundos"),
    "es": _parse_table(
        "€ => euros\n% => por ciento\n°C => grados celsius\n"
        "°F => grados fahrenheit\n°K => grados kelvin\n° => grados\n"
        "$ => dólares\n£ => libras\nkm => kilómetros\nm => metros\n"
        "cm => centímetros\nkg => kilogramos\ng => gramos\nL => litros\n"
        "mL => millilitros"),
    "fr": _parse_table(
        "€ => euros\n% => pour cent\n°C => degrés celsius\n"
        "°F => degrés fahrenheit\n°K => degrés kelvin\n° => degrés\n"
        "$ => dollars\n£ => livres\nkm => kilomètres\nm => mètres\n"
        "cm => centimètres\nkg => kilogrammes\ng => grammes\nL => litres\n"
        "mL => millilitres"),
    "de": _parse_table(
        "€ => Euro\n% => Prozent\n°C => Grad Celsius\n"
        "°F => Grad Fahrenheit\n°K => Grad Kelvin\n° => Grad\n"
        "$ => Dollar\n£ => Pfund\nkm => Kilometer\nm => Meter\n"
        "cm => Zentimeter\nkg => Kilogramm\ng => Gramm\nL => Liter\n"
        "mL => Milliliter"),
}


def _get_number_separators(full_lang: str) -> Tuple[str, str]:
    """(decimal, thousands) separators for the locale (util.py:362-375)."""
    if full_lang.split("-")[0] in ("pt", "es", "fr", "de", "it", "nl",
                                   "gl", "ca"):
        return ",", "."
    return ".", ","


def is_fraction(word: str) -> bool:
    """'3/4'-style fraction test (reference util.py:628-635)."""
    parts = word.split("/")
    return len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit()


def _normalize_number_word(word: str, full_lang: str) -> str:
    """Realise one token if it is a number/fraction (util.py:378-432)."""
    cleaned = word.rstrip(string.punctuation)
    suffix = word[len(cleaned):]

    if is_fraction(cleaned):
        try:
            return pronounce_fraction(cleaned, full_lang) + suffix
        except Exception as exc:
            LOG.error("failed to pronounce fraction %s (%s)", word, exc)
            return word

    decimal_sep, thousands_sep = _get_number_separators(full_lang)
    candidate = cleaned

    both = (
        thousands_sep in candidate
        and decimal_sep in candidate
        and candidate.index(thousands_sep) < candidate.index(decimal_sep)
    )
    if both:
        candidate = candidate.replace(thousands_sep, "").replace(decimal_sep, ".")
    elif decimal_sep in candidate and is_numeric(
        candidate.replace(decimal_sep, ".", 1)
    ):
        candidate = candidate.replace(decimal_sep, ".")
    elif thousands_sep in candidate and is_numeric(
        candidate.replace(thousands_sep, "", 1)
    ):
        candidate = candidate.replace(thousands_sep, "")

    if is_numeric(candidate):
        try:
            num = float(candidate) if "." in candidate else int(candidate)
            return pronounce_number(num, lang=full_lang) + suffix
        except Exception as exc:
            LOG.error("failed to pronounce number %s (%s)", word, exc)
            return word

    return word


def pronounce_date(date_obj: date, full_lang: str) -> str:
    """Speakable date (reference util.py:436-440)."""
    return nice_date(date_obj, full_lang)


def pronounce_time(time_string: str, full_lang: str) -> str:
    """Speakable '19h30'-style military time (reference util.py:443-456)."""
    try:
        hours, mins = time_string.split("h")
        time_obj = datetime.time(int(hours), int(mins))
        return nice_time(
            time_obj, full_lang, speech=True, use_24hour=True, use_ampm=False
        )
    except Exception as exc:
        LOG.warning("Failed to parse time string '%s': %s", time_string, exc)
        return time_string.replace("h", " ")


_TIME_PATTERN = re.compile(r"(\d{1,2})h(\d{2})", re.IGNORECASE)
_DATE_PATTERN = re.compile(r"(\d{1,4})[/-](\d{1,2})[/-](\d{1,4})")
_AMPM_PATTERN = re.compile(r"(?i)(\d+)(am|pm)")
# Divergence from the reference: util.py:469 does a bare str.replace which
# rewrites "team" -> "teA M" and "ma'am" -> "ma'A M"; we only expand am/pm
# tokens directly preceded by a digit (a time expression).
_AMPM_WORD = re.compile(r"(?i)(?<=\d )(am|pm)\b")


def _normalize_dates_and_times(
    text: str, full_lang: str, date_format: str = "DMY"
) -> str:
    """Expand date and time expressions (reference util.py:459-531)."""
    lang_code = full_lang.split("-")[0]
    if lang_code == "en":
        text = _AMPM_PATTERN.sub(r"\1 \2", text)
        text = _AMPM_WORD.sub(
            lambda m: "A M" if m.group(1).lower() == "am" else "P M", text
        )

    text = _TIME_PATTERN.sub(
        lambda m: pronounce_time(m.group(0), full_lang), text
    )

    match = _DATE_PATTERN.search(text)
    if not match:
        return text

    part1, part2, part3 = match.groups()
    p1, p2, p3 = int(part1), int(part2), int(part3)

    day: Optional[int] = None
    month: Optional[int] = None

    # A 4-digit field is the year; otherwise assume a trailing 2-digit year.
    if len(part1) == 4:
        year, rest = p1, [p2, p3]
    elif len(part3) == 4:
        year, rest = p3, [p1, p2]
    else:
        year = p3
        if year < 100:
            year = 2000 + year if year < 30 else 1900 + year
        rest = [p1, p2]

    # A 2-digit value > 12 can only be a day.
    if any(p > 12 and len(str(p)) == 2 for p in rest):
        day = next((p for p in rest if p > 12), None)
        if day is not None:
            rest.remove(day)
            month = rest[0]

    if day is None or month is None:
        if date_format.lower() == "mdy":
            month, day = rest[0], rest[1]
        else:
            day, month = rest[0], rest[1]

    try:
        date_obj = date(year, month, day)
        text = text.replace(match.group(0), pronounce_date(date_obj, full_lang))
    except (ValueError, IndexError) as exc:
        LOG.warning("Could not parse date from '%s': %s", match.group(0), exc)

    return text


_WORD_HYPHEN_DIGIT = re.compile(r"(\w+)-(\d+)")


def _normalize_word_hyphen_digit(text: str) -> str:
    """'sub-23' -> 'sub 23' (reference util.py:534-542)."""
    return _WORD_HYPHEN_DIGIT.sub(r"\1 \2", text)


def _parse_locale_number(number: str, decimal_sep: str, thousands_sep: str):
    if thousands_sep in number and decimal_sep in number:
        number = number.replace(thousands_sep, "").replace(decimal_sep, ".")
    elif decimal_sep != "." and decimal_sep in number:
        number = number.replace(decimal_sep, ".")
    return float(number) if "." in number else int(number)


def _normalize_units(text: str, full_lang: str) -> str:
    """Expand '<number><unit>' patterns (reference util.py:545-605)."""
    text = text.replace("º", "°")  # visually identical ordinal indicator
    lang_code = full_lang.split("-")[0]
    units = UNITS.get(lang_code)
    if not units:
        return text

    decimal_sep, thousands_sep = _get_number_separators(full_lang)
    number_re = (
        rf"(\d+[{re.escape(thousands_sep)}]?\d*[{re.escape(decimal_sep)}]?\d*)"
    )

    def _substitute(unit_table: Dict[str, str], tail: str) -> None:
        nonlocal text
        if not unit_table:
            return
        sorted_units = sorted(unit_table, key=len, reverse=True)
        unit_re = "|".join(re.escape(u) for u in sorted_units)
        pattern = re.compile(
            number_re + r"\s*(" + unit_re + r")" + tail, re.IGNORECASE
        )

        # the pattern is case-insensitive, so index case-insensitively too
        # (the reference does unit_table[match] and crashes on '10 KM')
        folded = {k.lower(): v for k, v in unit_table.items()}

        def _replace(match: "re.Match[str]") -> str:
            try:
                num = _parse_locale_number(
                    match.group(1), decimal_sep, thousands_sep
                )
                words = pronounce_number(num, full_lang)
            except Exception as exc:
                LOG.error("Failed to pronounce %s (%s)", match.group(0), exc)
                return match.group(0)
            unit_word = unit_table.get(match.group(2))
            if unit_word is None:
                unit_word = folded[match.group(2).lower()]
            return f"{words} {unit_word}"

        text = pattern.sub(_replace, text)

    # Symbolic units first (no word boundary possible after e.g. '%').
    _substitute({k: v for k, v in units.items() if not k.isalnum()}, "")
    _substitute({k: v for k, v in units.items() if k.isalnum()}, r"\b")
    return text


def _normalize_word(word: str, full_lang: str) -> str:
    """Contraction/title/number expansion for one token (util.py:608-625)."""
    lang_code = full_lang.split("-")[0]

    contraction = CONTRACTIONS.get(lang_code, {}).get(word)
    if contraction is not None:
        return contraction

    title = TITLES.get(lang_code, {}).get(word)
    if title is not None:
        return title

    return _normalize_number_word(word, full_lang)


def normalize(text: str, lang: str) -> str:
    """Normalize text for synthesis (reference util.py:638-668)."""
    full_lang = lang
    date_format = "MDY" if full_lang.lower() == "en-us" else "DMY"

    dialog = _normalize_dates_and_times(text, full_lang, date_format)
    dialog = _normalize_word_hyphen_digit(dialog)
    dialog = _normalize_units(dialog, full_lang)
    dialog = " ".join(
        _normalize_word(word, full_lang) for word in dialog.split()
    )
    return dialog
