"""Minimal BCP-47 language tag matching.

Replaces the reference's dependency on the ``langcodes`` package
(reference: phoonnx/phonemizers/base.py:86-122 and phoonnx/voice.py:34-41)
with a small self-contained implementation. The observable contract is the
same: a distance of 0 means exact match, small distances mean "same language,
different/missing region", and anything above 10 is treated as unsupported by
the callers.
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

# Legacy/alias language subtags -> canonical (ISO 639-1 where available).
_ALIASES = {
    "iw": "he",
    "ji": "yi",
    "in": "id",
    "mo": "ro",
    "tl": "fil",
    "cmn": "zh",
    "nb": "no",
    "nn": "no",
    "arb": "ar",
}

# ISO 639-2/3 (terminological AND bibliographic) -> ISO 639-1, for every
# language that has a two-letter code. langcodes normalizes these; without
# the table, 3-letter inventories (Charsiu 'eng-us', Epitran 'spa-Latn')
# never match 2-letter requests.
_ISO639_3TO1 = {
    "aar": "aa", "abk": "ab", "ave": "ae", "afr": "af", "aka": "ak",
    "amh": "am", "arg": "an", "ara": "ar", "asm": "as", "ava": "av",
    "aym": "ay", "aze": "az", "bak": "ba", "bel": "be", "bul": "bg",
    "bis": "bi", "bam": "bm", "ben": "bn", "bod": "bo", "tib": "bo",
    "bre": "br", "bos": "bs", "cat": "ca", "che": "ce", "cha": "ch",
    "cos": "co", "cre": "cr", "ces": "cs", "cze": "cs", "chu": "cu",
    "chv": "cv", "cym": "cy", "wel": "cy", "dan": "da", "deu": "de",
    "ger": "de", "div": "dv", "dzo": "dz", "ewe": "ee", "ell": "el",
    "gre": "el", "eng": "en", "epo": "eo", "spa": "es", "est": "et",
    "eus": "eu", "baq": "eu", "fas": "fa", "per": "fa", "ful": "ff",
    "fin": "fi", "fij": "fj", "fao": "fo", "fra": "fr", "fre": "fr",
    "fry": "fy", "gle": "ga", "gla": "gd", "glg": "gl", "grn": "gn",
    "guj": "gu", "glv": "gv", "hau": "ha", "heb": "he", "hin": "hi",
    "hmo": "ho", "hrv": "hr", "hat": "ht", "hun": "hu", "hye": "hy",
    "arm": "hy", "her": "hz", "ina": "ia", "ind": "id", "ile": "ie",
    "ibo": "ig", "iii": "ii", "ipk": "ik", "ido": "io", "isl": "is",
    "ice": "is", "ita": "it", "iku": "iu", "jpn": "ja", "jav": "jv",
    "kat": "ka", "geo": "ka", "kon": "kg", "kik": "ki", "kua": "kj",
    "kaz": "kk", "kal": "kl", "khm": "km", "kan": "kn", "kor": "ko",
    "kau": "kr", "kas": "ks", "kur": "ku", "kom": "kv", "cor": "kw",
    "kir": "ky", "lat": "la", "ltz": "lb", "lug": "lg", "lim": "li",
    "lin": "ln", "lao": "lo", "lit": "lt", "lub": "lu", "lav": "lv",
    "mlg": "mg", "mah": "mh", "mri": "mi", "mao": "mi", "mkd": "mk",
    "mac": "mk", "mal": "ml", "mon": "mn", "mar": "mr", "msa": "ms",
    "may": "ms", "mlt": "mt", "mya": "my", "bur": "my", "nau": "na",
    "nob": "nb", "nde": "nd", "nep": "ne", "ndo": "ng", "nld": "nl",
    "dut": "nl", "nno": "nn", "nor": "no", "nbl": "nr", "nav": "nv",
    "nya": "ny", "oci": "oc", "oji": "oj", "orm": "om", "ori": "or",
    "oss": "os", "pan": "pa", "pli": "pi", "pol": "pl", "pus": "ps",
    "por": "pt", "que": "qu", "roh": "rm", "run": "rn", "ron": "ro",
    "rum": "ro", "rus": "ru", "kin": "rw", "san": "sa", "srd": "sc",
    "snd": "sd", "sme": "se", "sag": "sg", "sin": "si", "slk": "sk",
    "slo": "sk", "slv": "sl", "smo": "sm", "sna": "sn", "som": "so",
    "sqi": "sq", "alb": "sq", "srp": "sr", "ssw": "ss", "sot": "st",
    "sun": "su", "swe": "sv", "swa": "sw", "tam": "ta", "tel": "te",
    "tgk": "tg", "tha": "th", "tir": "ti", "tuk": "tk", "tgl": "tl",
    "tsn": "tn", "ton": "to", "tur": "tr", "tso": "ts", "tat": "tt",
    "twi": "tw", "tah": "ty", "uig": "ug", "ukr": "uk", "urd": "ur",
    "uzb": "uz", "ven": "ve", "vie": "vi", "vol": "vo", "wln": "wa",
    "wol": "wo", "xho": "xh", "yid": "yi", "yor": "yo", "zha": "za",
    "zho": "zh", "chi": "zh", "zul": "zu",
}

# Macrolanguage groupings considered "close enough" to match.
_MACRO_GROUPS = [
    {"zh", "cmn", "yue", "wuu", "hak", "nan"},
    {"no", "nb", "nn"},
    {"ar", "arb", "arz", "ary", "apc", "acm", "afb"},
    {"ms", "zsm", "ind", "id"},
    {"fa", "prs", "pes"},
    {"sq", "als", "aln"},
]


@dataclass(frozen=True)
class LangTag:
    language: str
    script: Optional[str] = None
    region: Optional[str] = None
    variants: Tuple[str, ...] = ()

    def __str__(self) -> str:
        parts = [self.language]
        if self.script:
            parts.append(self.script.title())
        if self.region:
            parts.append(self.region.upper())
        parts.extend(self.variants)
        return "-".join(parts)


def parse_tag(tag: str) -> LangTag:
    """Parse a (possibly sloppy) BCP-47-ish tag like ``en_US`` or ``pt-br``."""
    parts = [p for p in tag.replace("_", "-").split("-") if p]
    if not parts:
        return LangTag(language="und")
    language = parts[0].lower()
    language = _ISO639_3TO1.get(language, language)
    language = _ALIASES.get(language, language)
    script: Optional[str] = None
    region: Optional[str] = None
    variants: List[str] = []
    for part in parts[1:]:
        if script is None and region is None and len(part) == 4 and part.isalpha():
            script = part.lower()
        elif region is None and (
            (len(part) == 2 and part.isalpha()) or (len(part) == 3 and part.isdigit())
        ):
            region = part.lower()
        else:
            variants.append(part.lower())
    return LangTag(language, script, region, tuple(variants))


def _same_macro(a: str, b: str) -> bool:
    for group in _MACRO_GROUPS:
        if a in group and b in group:
            return True
    return False


def tag_distance(desired: str, supported: str) -> int:
    """Distance between two language tags; <=10 counts as a usable match.

    0 exact; small values for region/script drift within the same language;
    1000 for different languages (with macrolanguage groups counted as the
    same language at a small penalty).
    """
    a = parse_tag(desired)
    b = parse_tag(supported)

    if a.language != b.language:
        if _same_macro(a.language, b.language):
            base = 6
        elif a.language == "und" or b.language == "und":
            base = 10
        else:
            return 1000
    else:
        base = 0

    if a.script and b.script and a.script != b.script:
        return 1000
    if bool(a.script) != bool(b.script):
        base += 2

    if a.region and b.region and a.region != b.region:
        base += 6
    elif bool(a.region) != bool(b.region):
        base += 4

    if a.variants != b.variants:
        base += 1

    return base


def closest_match(desired: str, supported: List[str]) -> Tuple[str, int]:
    """Return ``(best_tag, distance)`` over ``supported`` (like langcodes)."""
    if not supported:
        return "und", 1000
    best_tag, best_distance = "und", 1000
    for candidate in supported:
        try:
            distance = tag_distance(desired, candidate)
        except Exception:
            continue
        if distance < best_distance:
            best_tag, best_distance = candidate, distance
    return best_tag, best_distance


def match_lang(target_lang: str, valid_langs: List[str]) -> str:
    """Pick the closest supported tag or raise ValueError.

    Mirrors BasePhonemizer.match_lang (reference: phonemizers/base.py:86-122),
    including the <=10 acceptance threshold and the progressive tag
    truncation retries the reference performs for malformed entries.
    """
    if target_lang in valid_langs:
        return target_lang
    best_lang, best_distance = closest_match(target_lang, valid_langs)
    if best_distance <= 10:
        return best_lang
    raise ValueError(f"unsupported language code: {target_lang}")
