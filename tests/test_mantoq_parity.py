"""Arabic G2P parity: our mantoq rule cascade vs the reference's."""

import sys

import pytest

from phoonnx_tpu.thirdparty.mantoq import g2p
from phoonnx_tpu.thirdparty.mantoq.phonetise import (
    arabic_to_buckwalter,
    buckwalter_to_arabic,
)

from .conftest import REFERENCE_PATH, requires_reference

CASES = [
    "مرحبا بالعالم",
    "ذهب الطالب إلى المكتبة لقراءة كتاب عن تاريخ الأندلس.",
    "الشمس",
    "فيل",
    "يوم",
    "سور",
    "لو",
    "هذا كتاب جميل",
    "لكن الوقت متأخر",
    "السلام عليكم ورحمة الله",
    "والله أعلم؟",
    "قل: «هذا صحيح»!",
    "أهلاً وسهلاً",
    "كيف حالك؟",
    "صباح الخير",
    "الْعَرَبِيَّةُ لُغَةٌ جَمِيلَةٌ",
    "هؤلاء الطلاب أذكياء",
    "ما شاء الله تبارك الله",
]


# text containing digits: the full spell+vocalize number pipeline
NUMBER_CASES = [
    "عندي 23 كتابا",
    "في عام 1995",
    "خصم 50% اليوم",
    "الساعة 12:30",
    "قرأت 3 كتب و 145 مقالا",
    "٧ أيام",
    "۴۵ نفر",
    "المجموع 1000000 دينار",
    "من 350 بلدا",
    "ارتفاع 2.5% فقط",
    "0 ثم 1 ثم 2 ثم 10 ثم 11 ثم 12",
    "سنة 2024، نعم",
]


def test_number_vocalization_goldens():
    """Vocalized number spelling (golden values from the reference
    pyarabic pipeline, mantoq/num2words.py:8)."""
    from phoonnx_tpu.thirdparty.mantoq.num2words import num2words

    assert num2words("0") == "صفر"
    assert num2words("1") == "وَاحِد"
    assert num2words("11") == "أَحَدَ عَشَرَ"
    assert num2words("15") == "خَمْسَ عَشْرَةَ"
    assert num2words("21") == "وَاحِد و عِشْرُونَ"
    assert num2words("200") == "مِئَتَانِ"
    assert num2words("256") == "مِئَتَانِ و سِتّ و خَمْسُونَ"
    assert num2words("3000") == "ثَلاث آلاَف"
    assert (num2words("12345")
            == "إثنا عَشَرَ أَلْف و ثَلَاثمِئَة و خمس و أَرْبَعُونَ")
    assert num2words("2000000") == "مِلْيُونَانِ"
    assert num2words("50%") == "خَمْسُونَ بِالْمِئَة"
    # \d+ semantics: a decimal point separates two independent numbers
    assert num2words("3.14") == "ثَلاث. أَرْبَعَ عَشْرَةَ"
    # plain (un-vocalized) mode
    assert num2words("21", apply_tashkeel=False) == "واحد و عشرون"


def test_buckwalter_roundtrip():
    text = "مرحبا"
    bw = arabic_to_buckwalter(text)
    assert bw == "mrHbA"
    assert buckwalter_to_arabic(bw) == text


def test_g2p_shape():
    normalized, tokens = g2p("مرحبا بالعالم")
    assert "_+_" in tokens
    assert all(isinstance(t, str) for t in tokens)
    # diacritized sun-letter assimilation: lam omitted, shadda -> _dbl_
    _, sun = g2p("الشَّمْس")
    assert sun == ["aa", "$", "_dbl_", "a", "m", "s"]


@requires_reference
def test_parity_with_reference():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            from phoonnx.thirdparty.mantoq import g2p as ref_g2p
    finally:
        sys.path.remove(REFERENCE_PATH)

    for case in CASES + NUMBER_CASES:
        ref_text, ref_tokens = ref_g2p(case)
        our_text, our_tokens = g2p(case)
        assert our_tokens == ref_tokens, case
        assert our_text == ref_text, case


@requires_reference
def test_num2words_parity_with_reference():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            from phoonnx.thirdparty.mantoq.num2words import (
                num2words as ref_num2words,
            )
    finally:
        sys.path.remove(REFERENCE_PATH)
    from phoonnx_tpu.thirdparty.mantoq.num2words import num2words

    cases = [str(n) for n in range(0, 400)]
    cases += ["999", "1001", "2024", "54321", "123456789", "1000000007",
              "3.14", "50%", "٢٣ درجة", "في عام 1995 ولدت"]
    for case in cases:
        for tashkeel in (True, False):
            assert (num2words(case, apply_tashkeel=tashkeel)
                    == ref_num2words(case, apply_tashkeel=tashkeel)), case


def test_number_beyond_scale_table_reads_digits():
    """Digit runs past milliards (13+ digits) are read digit-by-digit —
    the reference raises KeyError there (pyarabic number.py:141-152)."""
    from phoonnx_tpu.thirdparty.mantoq.num2words import num2words

    from phoonnx_tpu.thirdparty.mantoq.num2words import strip_tashkeel

    out = num2words("1234567890123")
    assert out  # no crash
    assert "واحد" in strip_tashkeel(out)  # starts with 'one'
    # 12-digit runs still use the full spelling path
    assert "مليار" in strip_tashkeel(num2words("999999999999"))
