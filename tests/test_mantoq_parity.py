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

    for case in CASES:
        _, ref_tokens = ref_g2p(case)
        _, our_tokens = g2p(case)
        assert our_tokens == ref_tokens, case
