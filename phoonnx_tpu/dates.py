"""Self-contained date/time pronunciation.

Replaces the reference's ``ovos-date-parser`` dependency (reference:
phoonnx/util.py:7, 436-456) with built-in realisations for en/pt/es/fr/de
and a digit fallback elsewhere. If ovos-date-parser is installed it is
preferred so output matches the reference exactly.
"""

import datetime
from datetime import date

from phoonnx_tpu.numbers import (
    pronounce_number,
    pronounce_ordinal,
    pronounce_year,
)

try:  # pragma: no cover - only when ovos deps are installed
    from ovos_date_parser import nice_date as _ovos_nice_date
    from ovos_date_parser import nice_time as _ovos_nice_time

    _HAVE_OVOS = True
except ImportError:
    _HAVE_OVOS = False

_MONTHS = {
    "en": ["january", "february", "march", "april", "may", "june", "july",
           "august", "september", "october", "november", "december"],
    "pt": ["janeiro", "fevereiro", "março", "abril", "maio", "junho", "julho",
           "agosto", "setembro", "outubro", "novembro", "dezembro"],
    "es": ["enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
           "agosto", "septiembre", "octubre", "noviembre", "diciembre"],
    "fr": ["janvier", "février", "mars", "avril", "mai", "juin", "juillet",
           "août", "septembre", "octobre", "novembre", "décembre"],
    "de": ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
           "August", "September", "Oktober", "November", "Dezember"],
    "gl": ["xaneiro", "febreiro", "marzo", "abril", "maio", "xuño", "xullo",
           "agosto", "setembro", "outubro", "novembro", "decembro"],
    "ca": ["gener", "febrer", "març", "abril", "maig", "juny", "juliol",
           "agost", "setembre", "octubre", "novembre", "desembre"],
}


def nice_date(date_obj: date, lang: str = "en") -> str:
    """Speakable date ('march eighth, twenty twenty five' for en)."""
    if _HAVE_OVOS:  # pragma: no cover
        try:
            return _ovos_nice_date(
                datetime.datetime.combine(date_obj, datetime.time()), lang
            )
        except Exception:
            pass

    lang_code = lang.split("-")[0]
    months = _MONTHS.get(lang_code)
    if months is None:
        months = _MONTHS["en"]
        lang_code = "en"
    month = months[date_obj.month - 1]
    year = pronounce_year(date_obj.year, lang_code)

    if lang_code == "en":
        day = pronounce_ordinal(date_obj.day, "en")
        return f"{month} {day}, {year}"
    day = pronounce_number(date_obj.day, lang_code)
    if lang_code in ("pt", "es", "gl", "ca"):
        de = "de"
        return f"{day} {de} {month} {de} {year}"
    if lang_code == "fr":
        return f"{day} {month} {year}"
    return f"{day}. {month} {year}"


def nice_time(
    time_obj: datetime.time,
    lang: str = "en",
    speech: bool = True,
    use_24hour: bool = True,
    use_ampm: bool = False,
) -> str:
    """Speakable time; 24h style ('nineteen thirty', 'dez e trinta')."""
    if _HAVE_OVOS:  # pragma: no cover
        try:
            return _ovos_nice_time(
                time_obj, lang, speech=speech, use_24hour=use_24hour,
                use_ampm=use_ampm,
            )
        except Exception:
            pass

    lang_code = lang.split("-")[0]
    hour, minute = time_obj.hour, time_obj.minute

    if lang_code == "en":
        hour_words = pronounce_number(hour, "en")
        if minute == 0:
            return f"{hour_words} hundred" if use_24hour else f"{hour_words} o'clock"
        if minute < 10:
            return f"{hour_words} oh {pronounce_number(minute, 'en')}"
        return f"{hour_words} {pronounce_number(minute, 'en')}"

    hour_words = pronounce_number(hour, lang_code)
    minute_words = pronounce_number(minute, lang_code)
    joiner = {"pt": "e", "es": "y", "fr": "heures", "de": "Uhr", "gl": "e",
              "ca": "i"}.get(lang_code, "")
    if lang_code == "fr":
        return f"{hour_words} heures {minute_words}" if minute else f"{hour_words} heures"
    if lang_code == "de":
        return f"{hour_words} Uhr {minute_words}" if minute else f"{hour_words} Uhr"
    if minute == 0:
        return hour_words
    return f"{hour_words} {joiner} {minute_words}"
