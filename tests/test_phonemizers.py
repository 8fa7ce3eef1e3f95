"""Phonemizer framework tests: base pipeline, trivial engines, registry,
language fuzzy-matching tables, third-party text components."""

import pytest

from phoonnx_tpu.config import Alphabet
from phoonnx_tpu.phonemizers import (
    EspeakPhonemizer,
    GraphemePhonemizer,
    RawPhonemes,
    UnicodeCodepointPhonemizer,
)
from phoonnx_tpu.phonemizers.base import BasePhonemizer


def test_chunk_text_clauses():
    chunks = BasePhonemizer.chunk_text("Hello, world: again; done.")
    texts = [c[0] for c in chunks]
    assert texts == ["Hello", "world", "again", "done."]
    # last chunk of the sentence carries end-of-sentence
    assert chunks[-1][2] is True


def test_chunk_text_multisentence():
    chunks = BasePhonemizer.chunk_text("First one. Second one!")
    eos_flags = [c[2] for c in chunks]
    assert eos_flags == [True, True]
    assert chunks[0][1] == "."
    assert chunks[1][1] == "!"


def test_remove_punctuation():
    assert BasePhonemizer.remove_punctuation("hi, there!") == "hi there"


def test_process_phones_strips_lang_flags():
    out = BasePhonemizer._process_phones(
        [("h(en)ello", ".", True), ("more", ".", True)]
    )
    assert out == [list("hello"), list("more")]


def test_raw_phonemizer():
    raw = RawPhonemes()
    # phonemize_string is the identity
    assert raw.phonemize_string("h@loU", "en") == "h@loU"
    # the full pipeline strips punctuation chars (like the reference)
    out = raw.phonemize("hello world", "en")
    assert len(out) == 1
    assert "".join(out[0]) == "hello world"


def test_grapheme_phonemizer():
    g = GraphemePhonemizer()
    assert g.phonemize_string("Hello-World; <ok>", "en") == "hello world, ok"


def test_unicode_phonemizer_nfd():
    u = UnicodeCodepointPhonemizer()
    out = u.phonemize_string("é", "fr")
    assert len(out) == 2  # e + combining accent


def test_espeak_get_lang():
    assert EspeakPhonemizer.get_lang("en-gb") == "en-gb-x-rp"
    assert EspeakPhonemizer.get_lang("en-US") == "en-us"
    assert EspeakPhonemizer.get_lang("pt-BR") == "pt"  # base-lang branch wins
    assert EspeakPhonemizer.get_lang("de") == "de"
    with pytest.raises(ValueError):
        EspeakPhonemizer.get_lang("zzz")


def test_espeak_missing_binary():
    from phoonnx_tpu.phonemizers.mul import EspeakError

    espeak = EspeakPhonemizer()
    try:
        out = espeak.phonemize_string("hello", "en")
        assert isinstance(out, str)  # binary present
    except EspeakError:
        pass  # expected in environments without espeak-ng


def test_registry_imports():
    import phoonnx_tpu.phonemizers as registry

    for name in registry.__all__:
        assert hasattr(registry, name), name


def test_get_phonemizer_factory_trivial():
    from phoonnx_tpu.config import PhonemeType, get_phonemizer

    assert isinstance(get_phonemizer(PhonemeType.RAW), RawPhonemes)
    assert isinstance(get_phonemizer(PhonemeType.GRAPHEMES),
                      GraphemePhonemizer)
    assert isinstance(get_phonemizer(PhonemeType.UNICODE),
                      UnicodeCodepointPhonemizer)


# ---------------------------------------------------------------------------
# Third-party text components
# ---------------------------------------------------------------------------


def test_arpa2ipa():
    from phoonnx_tpu.thirdparty.arpa2ipa import arpa_to_ipa_lookup

    assert arpa_to_ipa_lookup["AA"] == "ɑ"
    assert arpa_to_ipa_lookup["AH0"] == "ə"
    assert len(arpa_to_ipa_lookup) == 99


def test_bw2ipa():
    from phoonnx_tpu.thirdparty.bw2ipa import translate

    assert translate("m a r H a b a") == "m a r ħ a b a"
    # gemination vs vowel length
    assert translate("a_dbl_") == "aː"
    assert translate("b_dbl_") == "bb"
    assert translate("$") == "ʃ"


def test_zh_num():
    from phoonnx_tpu.thirdparty.zh_num import num2str, num2zh

    assert num2zh(0) == "零"
    assert num2zh(20) == "二十"
    assert num2zh(105) == "一百零五"
    assert num2zh(12) == "十二"
    assert num2zh(32000) == "三万二千"
    assert num2str("20") == "二十"
    assert num2str("3.14") == "三点一四"
    assert num2str("50%") == "百分之五十"
    assert num2str("3/4") == "四分之三"
    assert num2str("-7") == "负七"


def test_kog2p():
    from phoonnx_tpu.thirdparty.kog2p import graph2phone, runKoG2P

    romanized = graph2phone("안녕")
    assert romanized  # non-empty romanization
    out = runKoG2P("안녕하세요")
    assert out and all("가" <= c <= "힣" or c == " "
                       or "ㄱ" <= c <= "ㅣ" for c in out)


def test_hangul2ipa():
    from phoonnx_tpu.thirdparty.hangul2ipa import hangul2ipa

    out = hangul2ipa("안녕하세요")
    assert out
    assert all(ord(c) < 0xAC00 for c in out)  # all IPA, no hangul left


def test_mantoq_g2p():
    from phoonnx_tpu.thirdparty.mantoq import g2p

    normalized, tokens = g2p("مرحبا بالعالم")
    assert tokens
    assert "_+_" in tokens  # word separator between the two words
    from phoonnx_tpu.thirdparty.bw2ipa import translate

    ipa = translate("".join(tokens).replace("_+_", " "))
    assert ipa.strip()


def test_tashkeel_identity_fallback():
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    t = TashkeelDiacritizer()
    text = "مرحبا بالعالم"
    assert t.diacritize(text) == text  # no model blob -> identity


def test_cotovia2ipa_table():
    from phoonnx_tpu.phonemizers.gl import cotovia2ipa

    assert cotovia2ipa("tS") == "tʃ"
    # SINGLE-PASS longest-match: the reference's sequential replace
    # cascaded "rr" -> "r" -> "ɾ", collapsing the trill/tap minimal
    # pair (caro/carro) — divergence fix, found by review
    assert cotovia2ipa("rr") == "r"
    assert cotovia2ipa("karro") == "karo"
    assert cotovia2ipa("karo") == "kaɾo"
    assert cotovia2ipa("pau") == " "


def test_voice_phonetic_spellings(tmp_path):
    from phoonnx_tpu.voice import PhoneticSpellings

    spellings_file = tmp_path / "phonetic_spellings.txt"
    spellings_file.write_text("OpenVoiceOS: Open Voice O S\n",
                              encoding="utf-8")
    spellings = PhoneticSpellings.from_path(str(spellings_file))
    assert spellings.apply("I use openvoiceos daily") == \
        "I use Open Voice O S daily"
    # word boundaries respected
    assert spellings.apply("theopenvoiceosx") == "theopenvoiceosx"


def test_audio_chunk_int16():
    import numpy as np

    from phoonnx_tpu.voice import AudioChunk

    chunk = AudioChunk(22050, 2, 1, np.asarray([0.0, 0.5, -1.5], np.float32))
    pcm = chunk.audio_int16_array
    assert pcm.dtype == np.int16
    assert pcm[0] == 0
    assert pcm[1] == 16383
    assert pcm[2] == -32767  # clipped
    assert chunk.audio_int16_bytes == pcm.tobytes()


def test_zh_retone():
    from phoonnx_tpu.phonemizers.zh import BaseChinesePinyinPhonemizer

    retone = BaseChinesePinyinPhonemizer._retone
    assert retone("ma˧˩˧") == "ma↓"
    assert retone("ma˧˥") == "ma↗"
    assert retone("ma˥˩") == "ma↘"
    assert retone("ma˥") == "ma→"


def test_korean_ipa_pipeline_to_ids():
    """Full offline ko path: KoG2P rules -> hangul2ipa -> default IPA ids."""
    from phoonnx_tpu.phoneme_ids import phonemes_to_ids
    from phoonnx_tpu.phonemizers.ko import KoG2PPhonemizer

    pho = KoG2PPhonemizer(Alphabet.IPA)
    ipa = pho.phonemize_string("안녕하세요", "ko")
    assert ipa
    ids = phonemes_to_ids(list(ipa))
    assert len(ids) > 4
    assert ids[0] == 1 and ids[-1] == 2  # bos/eos


def test_arabic_ipa_pipeline_to_ids():
    """Full offline ar path: mantoq -> bw2ipa -> default IPA ids."""
    from phoonnx_tpu.phoneme_ids import phonemes_to_ids
    from phoonnx_tpu.phonemizers.ar import MantoqPhonemizer

    pho = MantoqPhonemizer(Alphabet.IPA)
    ipa = pho.phonemize_string("مرحبا بالعالم", "ar")
    ids = phonemes_to_ids(list(ipa))
    assert len(ids) > 4


def test_hangul2ipa_hanja_conversion():
    """Hanja characters convert to their hangul readings (incl. the
    不-pronunciation rules and the word-initial 두음법칙) instead of
    being silently deleted from the synthesized speech (found by
    review; parity values from the reference implementation)."""
    from phoonnx_tpu.thirdparty.hangul2ipa import hangul2ipa, sanitize

    assert hangul2ipa("韓國 사람") == "häŋɡuk säɾäm"
    assert sanitize("不實") == "부실"
    assert sanitize("不動産") == "부동산"  # 부 before alveolar ㄷ
    assert sanitize("李舜臣")[0] == "이"  # word-initial rule: 리 -> 이


def test_tashkeel_diac_normalization_swaps_order():
    """haraka+shadda normalizes to the composed shadda+haraka order the
    hint map contains — bidi rendering made a literal transcription map
    every key to ITSELF (diacritize then crashed with KeyError on
    haraka-first input; found by review)."""
    from phoonnx_tpu.thirdparty.tashkeel import NORMALIZED_DIAC_MAP

    assert NORMALIZED_DIAC_MAP, "map must not be empty"
    for key, value in NORMALIZED_DIAC_MAP.items():
        assert key != value, hex(ord(key[0]))
        assert key[::-1] == value
        assert key[1] == "ّ"  # shadda second in the key...
        assert value[0] == "ّ"  # ...first in the normalized form


def test_epitran_reference_inventory():
    """The epitran language list is an interchange table transcribed
    from the reference VERBATIM — a trimmed list broke 73 languages and
    resolved Cantonese to Mandarin (found by review)."""
    from phoonnx_tpu.phonemizers.mul import EpitranPhonemizer as E

    assert len(E.EPITRAN_LANGS) == 145
    assert E.get_lang("fi") == "fin-Latn"
    assert E.get_lang("yue") == "yue-Latn"
    assert E.get_lang("ka") == "kat-Geor"
    assert E.get_lang("km") == "khm-Khmr"
