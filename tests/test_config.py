"""VoiceConfig format detection/parsing tests (+ parity vs reference)."""

import sys

from phoonnx_tpu.config import Alphabet, PhonemeType, VoiceConfig
from phoonnx_tpu.phoneme_ids import BlankBetween

from .conftest import REFERENCE_PATH, requires_reference

PIPER_CONFIG = {
    "phoneme_type": "espeak",
    "phoneme_id_map": {"_": [0], "^": [1], "$": [2], " ": [3], "a": [14]},
    "language": {"code": "en-US"},
    "espeak": {"voice": "en-us"},
    "audio": {"sample_rate": 22050},
    "num_symbols": 256,
    "num_speakers": 1,
    "inference": {"noise_scale": 0.5, "length_scale": 1.2, "noise_w": 0.7},
}

PHOONNX_CONFIG = {
    "phoneme_type": "espeak",
    "lang_code": "en-GB",
    "alphabet": "ipa",
    "phoneme_id_map": {"_": 0, "^": 1, "$": 2, " ": 3, "a": 14},
    "audio": {"sample_rate": 22050},
    "num_symbols": 161,
    "num_speakers": 1,
}

MIMIC3_CONFIG = {
    "phonemizer": "espeak",
    "text_language": "en",
    "phonemes": {"blank_between": "words", "pad": "_", "bos": "^", "eos": "$"},
    "audio": {"sample_rate": 22050},
}

COQUI_CONFIG = {
    "characters": {
        "characters_class": "TTS.tts.models.vits.VitsCharacters",
        "pad": "<PAD>",
        "characters": "abc ",
        "punctuations": ".,",
        "blank": "<BLNK>",
    },
    "add_blank": True,
    "datasets": [{"language": "pt"}],
    "audio": {"sample_rate": 16000},
}


def test_sniffers():
    assert VoiceConfig.is_piper(PIPER_CONFIG)
    assert not VoiceConfig.is_piper(MIMIC3_CONFIG)
    assert VoiceConfig.is_mimic3(MIMIC3_CONFIG)
    assert not VoiceConfig.is_mimic3(PIPER_CONFIG)
    assert VoiceConfig.is_coqui_vits(COQUI_CONFIG)
    assert VoiceConfig.is_phoonnx(PHOONNX_CONFIG)
    assert not VoiceConfig.is_cotovia(COQUI_CONFIG)


def test_piper_parse():
    cfg = VoiceConfig.from_dict(dict(PIPER_CONFIG))
    assert cfg.phoneme_type == PhonemeType.ESPEAK
    assert cfg.alphabet == Alphabet.IPA
    assert cfg.lang_code == "en-US"
    assert cfg.sample_rate == 22050
    assert cfg.noise_scale == 0.5
    assert cfg.length_scale == 1.2
    assert cfg.noise_w_scale == 0.7
    assert cfg.pad_token == "_"
    assert cfg.bos_token == "^"
    assert cfg.eos_token == "$"
    assert cfg.include_whitespace  # " " in phoneme_id_map


def test_piper_text_model():
    config = dict(PIPER_CONFIG)
    config["phoneme_type"] = "text"
    cfg = VoiceConfig.from_dict(config)
    assert cfg.phoneme_type == PhonemeType.UNICODE
    assert cfg.alphabet == Alphabet.UNICODE


def test_phoonnx_parse():
    # An espeak phoonnx config also satisfies the piper sniffer (the piper
    # branch runs first and fixes up the token symbols) — same as reference.
    cfg = VoiceConfig.from_dict(dict(PHOONNX_CONFIG))
    assert cfg.phoneme_type == PhonemeType.ESPEAK
    assert cfg.lang_code == "en-GB"
    assert cfg.pad_token == "_"
    assert cfg.bos_token == "^"


def test_phoonnx_parse_non_piper_type():
    config = dict(PHOONNX_CONFIG)
    config["phoneme_type"] = "byt5"
    cfg = VoiceConfig.from_dict(config)
    assert cfg.phoneme_type == PhonemeType.BYT5
    # phoonnx training ids are built with the default specials but the
    # written config carries no token keys; the loader restores the
    # defaults (the reference loads such voices with token=None and drops
    # bos/eos/blank at inference — a train/infer mismatch, not replicated)
    assert cfg.pad_token == "_"
    assert cfg.blank_token == "_"
    assert cfg.bos_token == "^"
    assert cfg.eos_token == "$"
    # explicit keys still win
    config2 = dict(PHOONNX_CONFIG)
    config2["phoneme_type"] = "byt5"
    config2["bos"] = None
    cfg2 = VoiceConfig.from_dict(config2)
    assert cfg2.bos_token is None


def test_mimic3_parse(tmp_path):
    phonemes_txt = tmp_path / "phonemes.txt"
    phonemes_txt.write_text("0 _\n1 ^\n2 $\n3 \n4 a\n", encoding="utf-8")
    cfg = VoiceConfig.from_dict(dict(MIMIC3_CONFIG), phonemes_txt=str(phonemes_txt))
    assert cfg.phoneme_type == PhonemeType.ESPEAK
    assert cfg.blank_between == BlankBetween.WORDS
    assert cfg.phoneme_id_map[" "] == 3
    assert cfg.lang_code == "en"


def test_mimic3_include_whitespace_from_external_table(tmp_path):
    """include_whitespace must consider the EFFECTIVE table: mimic3 maps
    live in phonemes.txt, not the raw config (the reference keys this off
    the raw config only and silently drops whitespace ids)."""
    phonemes_txt = tmp_path / "phonemes.txt"
    phonemes_txt.write_text("0 _\n1 ^\n2 $\n3 \n4 a\n", encoding="utf-8")
    cfg = VoiceConfig.from_dict(dict(MIMIC3_CONFIG),
                                phonemes_txt=str(phonemes_txt))
    assert cfg.include_whitespace


def test_from_dict_honors_caller_overrides():
    """load()'s lang_code/phoneme_type_str overrides must survive the
    format branches (the reference reassigns them from the config)."""
    cfg = VoiceConfig.from_dict(dict(PIPER_CONFIG),
                                phoneme_type_str="gruut")
    assert cfg.phoneme_type == PhonemeType.GRUUT
    cfg2 = VoiceConfig.from_dict(dict(PIPER_CONFIG), lang_code="pt-BR")
    assert cfg2.lang_code == "pt-BR"


def test_mimic3_requires_phonemes_txt():
    import pytest

    with pytest.raises(ValueError):
        VoiceConfig.from_dict(dict(MIMIC3_CONFIG))


def test_coqui_parse():
    cfg = VoiceConfig.from_dict(dict(COQUI_CONFIG))
    assert cfg.phoneme_type == PhonemeType.GRAPHEMES
    assert cfg.alphabet == Alphabet.UNICODE
    assert cfg.lang_code == "pt"
    assert cfg.blank_between == BlankBetween.TOKENS
    # vocab order: [pad, punctuations, characters, blank]
    assert cfg.phoneme_id_map["<PAD>"] == 0
    assert cfg.phoneme_id_map["."] == 1
    assert cfg.phoneme_id_map[","] == 2
    assert cfg.phoneme_id_map["a"] == 3
    assert cfg.phoneme_id_map["<BLNK>"] == 7
    assert cfg.include_whitespace


@requires_reference
def test_parity_with_reference():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from phoonnx import config as ref
    finally:
        sys.path.remove(REFERENCE_PATH)

    for config in (PIPER_CONFIG, PHOONNX_CONFIG, COQUI_CONFIG):
        ours = VoiceConfig.from_dict(dict(config))
        theirs = ref.VoiceConfig.from_dict(dict(config))
        assert ours.num_symbols == theirs.num_symbols
        assert ours.num_speakers == theirs.num_speakers
        assert ours.sample_rate == theirs.sample_rate
        assert ours.lang_code == theirs.lang_code
        assert ours.phoneme_type.value == theirs.phoneme_type.value
        assert (ours.alphabet.value if ours.alphabet else None) == (
            theirs.alphabet.value
            if getattr(theirs.alphabet, "value", None)
            else theirs.alphabet
        )
        assert dict(ours.phoneme_id_map or {}) == dict(theirs.phoneme_id_map or {})
        assert ours.length_scale == theirs.length_scale
        assert ours.noise_scale == theirs.noise_scale
        assert ours.noise_w_scale == theirs.noise_w_scale
        assert ours.pad_token == theirs.pad_token
        assert ours.blank_token == theirs.blank_token
        assert ours.bos_token == theirs.bos_token
        assert ours.eos_token == theirs.eos_token
        assert ours.word_sep_token == theirs.word_sep_token
        assert ours.include_whitespace == theirs.include_whitespace
        assert ours.blank_between.value == theirs.blank_between.value


@requires_reference
def test_fuzz_piper_config_parity():
    """Randomized piper/text config sweep: every parsed field must match
    the reference parser (a 500-case sweep was clean when this landed;
    phoonnx-format deviations are deliberate and covered elsewhere)."""
    import random

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from phoonnx.config import VoiceConfig as Ref
    finally:
        sys.path.remove(REFERENCE_PATH)

    rng = random.Random(0)
    fields = ["num_symbols", "num_speakers", "sample_rate", "lang_code",
              "phoneme_type", "alphabet", "length_scale", "noise_scale",
              "noise_w_scale", "pad_token", "blank_token", "bos_token",
              "eos_token", "word_sep_token", "include_whitespace",
              "blank_at_start", "blank_at_end"]
    for _ in range(200):
        cfg = {"phoneme_type": rng.choice(["espeak", "text"]),
               "phoneme_id_map": {"_": 0, "^": 1, "$": 2, " ": 3,
                                  "a": 4, "b": 5}}
        if rng.random() < 0.5:
            cfg["language"] = {"code": rng.choice(["en-US", "de", "pt-BR"])}
        if rng.random() < 0.5:
            cfg["espeak"] = {"voice": rng.choice(["en-us", "de"])}
        if rng.random() < 0.7:
            cfg["audio"] = {"sample_rate": rng.choice([16000, 22050])}
        if rng.random() < 0.7:
            cfg["num_symbols"] = rng.randint(10, 300)
        if rng.random() < 0.5:
            cfg["num_speakers"] = rng.randint(1, 8)
        if rng.random() < 0.6:
            cfg["inference"] = {
                k: round(rng.uniform(0.1, 2.0), 3)
                for k in rng.sample(
                    ["noise_scale", "length_scale", "noise_w"],
                    rng.randint(0, 3))}
        if rng.random() < 0.3:
            cfg["blank_at_start"] = rng.choice([True, False])
        if rng.random() < 0.3:
            cfg["piper_version"] = "1.2.0"
        ours = VoiceConfig.from_dict(dict(cfg))
        theirs = Ref.from_dict(dict(cfg))
        for field in fields:
            a, b = getattr(ours, field), getattr(theirs, field)
            assert getattr(a, "value", a) == getattr(b, "value", b), \
                (field, cfg)


def test_coqui_bos_eos_absent_from_vocab_are_cleared():
    """A coqui config carrying characters bos/eos tokens WITHOUT
    enable_eos_bos_chars: the built vocab never contains them (coqui's
    own default is disabled), so keeping the tokens set made
    phonemes_to_ids emit the out-of-range id len(map) at every
    utterance edge — an out-of-bounds embedding lookup at synthesis
    (divergence fix: the reference inherits this crash)."""
    from phoonnx_tpu.phoneme_ids import phonemes_to_ids

    cfg_dict = dict(COQUI_CONFIG)
    cfg_dict["characters"] = dict(cfg_dict["characters"],
                                  bos="<BOS>", eos="<EOS>")
    cfg = VoiceConfig.from_dict(cfg_dict)
    assert "<BOS>" not in cfg.phoneme_id_map
    ids = phonemes_to_ids(
        ["a", "b"], id_map=cfg.phoneme_id_map,
        bos_token=cfg.bos_token, eos_token=cfg.eos_token,
        blank_token=cfg.blank_token,
        include_whitespace=cfg.include_whitespace,
    )
    assert all(0 <= i < len(cfg.phoneme_id_map) for i in ids), ids
