"""phoonnx_tpu — a TPU-native multilingual text-to-speech framework.

Ground-up JAX/XLA/Pallas rebuild of the capabilities of TigreGotico/phoonnx:
a linguistic front-end (normalizer, 29 phonemizers, tokenizer, multi-format
voice configs) feeding a VITS synthesis graph compiled for TPU, plus a
training pipeline (preprocess, VITS+GAN training with a scan/Pallas
monotonic-alignment kernel, checkpointing, export).

Public inference API (mirrors the reference):

    from phoonnx_tpu import TTSVoice, SynthesisConfig
    voice = TTSVoice.load("model.onnx", "config.json")
    with wave.open("out.wav", "wb") as f:
        voice.synthesize_wav("Hello world", f)
"""

from phoonnx_tpu.version import __version__  # noqa: F401

__all__ = [
    "__version__",
    "TTSVoice",
    "AudioChunk",
    "PhoneticSpellings",
    "SynthesisConfig",
    "VoiceConfig",
    "PhonemeType",
    "Alphabet",
    "get_phonemizer",
]


def __dir__():
    return sorted(set(globals()) | set(__all__))


def __getattr__(name):
    # Lazy imports keep `import phoonnx_tpu` cheap (no jax import for
    # front-end-only use) and avoid circular imports.
    if name in ("TTSVoice", "AudioChunk", "PhoneticSpellings"):
        from phoonnx_tpu import voice as _voice

        return getattr(_voice, name)
    if name in ("SynthesisConfig", "VoiceConfig", "PhonemeType", "Alphabet",
                "get_phonemizer"):
        from phoonnx_tpu import config as _config

        return getattr(_config, name)
    raise AttributeError(f"module 'phoonnx_tpu' has no attribute '{name}'")
