"""Subprocess phonemizers end-to-end with FAKE binaries.

espeak-ng and cotovia are external C binaries (not in CI); these tests
install tiny fake executables on PATH so OUR side of the contract —
argument construction, stdin/stdout plumbing, latin-1 decoding, espeak
lang-switch-flag stripping, the cotovia punctuation regex cascade and
SAMPA->IPA mapping — runs for real instead of only being error-tested.
"""

import os
import stat
import sys

import pytest


@pytest.fixture()
def fake_bin(tmp_path, monkeypatch):
    """Put a tmp dir first on PATH and return a script-writing helper."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}{os.environ['PATH']}")

    def write(name: str, body: str) -> str:
        path = bin_dir / name
        path.write_text(f"#!{sys.executable}\n{body}", encoding="utf-8")
        path.chmod(path.stat().st_mode | stat.S_IEXEC)
        return str(path)

    return write


def test_espeak_fake_binary_end_to_end(fake_bin):
    """Args + stdin + utf-8 stdout + (lang)-switch flag stripping."""
    fake_bin("espeak-ng", r"""
import sys
args = sys.argv[1:]
assert args[:4] == ["-q", "-x", "--ipa", "-v"], args
lang = args[4]
text = sys.stdin.read().strip()
# canned IPA with an espeak-style language-switch flag
sys.stdout.write(f"həloʊ (fr)bɔ̃ʒuʁ(en) wɝld [{lang}]\n")
""")
    from phoonnx_tpu.phonemizers.mul import EspeakPhonemizer

    ph = EspeakPhonemizer()
    out = ph.phonemize("Hello world.", "en-US")
    assert len(out) == 1
    joined = "".join(out[0])
    assert "həloʊ" in joined
    # switch flags must be stripped, their content kept
    assert "(fr)" not in joined and "(en)" not in joined
    assert "bɔ̃ʒuʁ" in joined
    # the reference maps en-US -> en-us for espeak
    assert "[en-us]" in joined


def test_espeak_fake_binary_en_gb_rp(fake_bin):
    fake_bin("espeak-ng", r"""
import sys
sys.stdout.write(sys.argv[5] + "\n")   # echo the voice name back
""")
    from phoonnx_tpu.phonemizers.mul import EspeakPhonemizer

    out = EspeakPhonemizer().phonemize_string("x", "en-GB")
    assert out == "en-gb-x-rp"  # RP accent like the reference


def test_espeak_error_surfaces(fake_bin):
    fake_bin("espeak-ng", r"""
import sys
sys.stderr.write("boom")
sys.exit(3)
""")
    from phoonnx_tpu.phonemizers.mul import EspeakError, EspeakPhonemizer

    with pytest.raises(EspeakError, match="boom"):
        EspeakPhonemizer().phonemize_string("x", "en")


def test_cotovia_fake_binary_end_to_end(fake_bin):
    """latin-1 stdout decode, punctuation cascade, SAMPA->IPA mapping."""
    fake_bin("cotovia", r"""
import sys
args = sys.argv[1:]
assert args == ["-t", "-n", "-S"], args
text = sys.stdin.buffer.read().decode("utf-8")
# SAMPA-ish answer with latin-1-only bytes and spacing quirks the
# regex cascade must fix (" ." -> ".", " \xb7" -> "...")
sys.stdout.buffer.write("bOs dIas \xb7 ?".encode("iso-8859-1"))
""")
    from phoonnx_tpu.config import Alphabet
    from phoonnx_tpu.phonemizers.gl import CotoviaPhonemizer

    ph = CotoviaPhonemizer(alphabet=Alphabet.IPA)
    out = ph.phonemize_string("bos días?", "gl-ES")
    assert "ɔ" in out      # O -> open o via COTOVIA2IPA
    assert "ɪ" not in out  # I is not in the table; stays literal
    assert "·" not in out  # " ·" rewritten to "..."
    assert " ?" not in out  # space before punctuation collapsed


def test_cotovia_raw_alphabet_skips_ipa_mapping(fake_bin):
    fake_bin("cotovia", r"""
import sys
sys.stdin.buffer.read()
sys.stdout.buffer.write(b"rr a t o")
""")
    from phoonnx_tpu.config import Alphabet
    from phoonnx_tpu.phonemizers.gl import CotoviaPhonemizer

    ph = CotoviaPhonemizer(alphabet=Alphabet.COTOVIA)
    out = ph.phonemize_string("rato", "gl")
    assert out == "rr a t o"  # raw cotovia alphabet passes through
