"""Voice-conversion CLI: re-speak a WAV in another speaker's voice.

Exposes SynthesizerTrn.voice_conversion (reference models.py:724-732,
which the reference never surfaces as a tool): posterior-encode the
source audio with the source speaker's embedding, pass the latents
through the flow in both directions, decode with the target speaker.
Requires a multi-speaker voice.

Usage:
    python -m phoonnx_tpu.convert -m voice.onnx -i in.wav \
        --from-speaker 0 --to-speaker 3 -o out.wav
"""

import logging
import sys
import wave

import click
import numpy as np

LOG = logging.getLogger("convert")


def _read_wav(path: str, expect_rate: int) -> np.ndarray:
    with wave.open(path, "rb") as f:
        if f.getframerate() != expect_rate:
            raise click.ClickException(
                f"input is {f.getframerate()} Hz but the voice expects "
                f"{expect_rate} Hz — resample first"
            )
        if f.getnchannels() != 1 or f.getsampwidth() != 2:
            raise click.ClickException("input must be mono 16-bit PCM")
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    return pcm.astype(np.float32) / 32767.0


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option("-m", "--model", required=True, help="Path to model.onnx")
@click.option("-c", "--config", "config_path", default=None)
@click.option("-i", "--input", "input_wav", required=True,
              help="Source WAV (mono 16-bit at the voice sample rate)")
@click.option("-o", "--output", required=True, help="Output WAV path")
@click.option("--from-speaker", type=int, required=True)
@click.option("--to-speaker", type=int, required=True)
@click.option("--seed", default=None, type=int)
@click.option("--debug", is_flag=True)
def main(model, config_path, input_wav, output, from_speaker, to_speaker,
         seed, debug) -> None:
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)
    from phoonnx_tpu.voice import TTSVoice

    voice = TTSVoice.load(model, config_path)
    n_speakers = voice.config.num_speakers
    for name, sid in (("--from-speaker", from_speaker),
                      ("--to-speaker", to_speaker)):
        if not 0 <= sid < n_speakers:
            # jnp.take clamps out-of-bounds ids under jit, which would
            # silently convert to the wrong speaker
            raise click.ClickException(
                f"{name} {sid} out of range: voice has {n_speakers} "
                f"speakers (0..{n_speakers - 1})"
            )
    audio = _read_wav(input_wav, voice.config.sample_rate)
    converted = voice.voice_conversion(audio, from_speaker, to_speaker,
                                       seed=seed)
    from phoonnx_tpu.voice import AudioChunk

    pcm = AudioChunk(
        sample_rate=voice.config.sample_rate, sample_width=2,
        sample_channels=1,
        audio_float_array=converted.astype(np.float32),
    ).audio_int16_array
    with wave.open(output, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(voice.config.sample_rate)
        f.writeframes(pcm.tobytes())
    LOG.info("wrote %s (%.2fs, speaker %d -> %d)", output,
             len(pcm) / voice.config.sample_rate, from_speaker, to_speaker)


if __name__ == "__main__":
    sys.exit(main())
