"""Synthesis CLI: text -> WAV on TPU.

Usage:
    python -m phoonnx_tpu.synthesize --model voice.onnx --config voice.json \
        --text "Hello world." --output out.wav
    echo "Hello." | python -m phoonnx_tpu.synthesize -m voice.onnx -o out.wav
"""

import logging
import sys
import time
import wave

import click

from phoonnx_tpu.config import SynthesisConfig
from phoonnx_tpu.observability import SynthesisStats

LOG = logging.getLogger("synthesize")


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option("-m", "--model", required=True, help="Path to model.onnx")
@click.option("-c", "--config", "config_path", default=None,
              help="Path to config.json (default: <model>.json)")
@click.option("-t", "--text", default=None,
              help="Text to synthesize (default: stdin)")
@click.option("-o", "--output", required=True, help="Output WAV path")
@click.option("--speaker-id", default=None, type=int)
@click.option("--length-scale", default=None, type=float)
@click.option("--noise-scale", default=None, type=float)
@click.option("--noise-w", default=None, type=float)
@click.option("--seed", default=None, type=int)
@click.option("--no-normalize", is_flag=True)
@click.option("--volume", default=1.0, type=float)
@click.option("--bf16", is_flag=True,
              help="Run the model in bfloat16 (2x throughput, ~1e-3 "
                   "waveform deviation)")
@click.option("--precision", default=None,
              type=click.Choice(["default", "high", "highest"]),
              help="Matmul precision (default: backend default, "
                   "measured 2.6e-4 waveform deviation vs CPU f32; "
                   "'highest' = true-f32 dots, 8.7e-7, ~3.5x device "
                   "time)")
@click.option("--stream", is_flag=True,
              help="Write WAV frames incrementally as the vocoder "
                   "produces them (sub-sentence chunked decode; implies "
                   "--no-normalize — the peak is unknown upfront)")
@click.option("--stats", "show_stats", is_flag=True,
              help="Print RTF/latency stats to stderr")
@click.option("--compile-cache/--no-compile-cache", default=True,
              help="Persist XLA compilations across runs "
                   "(~/.cache/phoonnx_tpu/xla)")
@click.option("--debug", is_flag=True)
def main(model, config_path, text, output, speaker_id, length_scale,
         noise_scale, noise_w, seed, no_normalize, volume, bf16, precision,
         stream, show_stats, compile_cache, debug) -> None:
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)
    if compile_cache:
        from phoonnx_tpu.observability import enable_compilation_cache

        enable_compilation_cache()
    from phoonnx_tpu.voice import TTSVoice

    if text is None:
        text = sys.stdin.read()

    voice = TTSVoice.load(
        model, config_path, dtype="bfloat16" if bf16 else "float32",
        matmul_precision=None if precision == "default" else precision,
    )
    syn_config = SynthesisConfig(
        speaker_id=speaker_id,
        length_scale=length_scale,
        noise_scale=noise_scale,
        noise_w_scale=noise_w,
        seed=seed,
        normalize_audio=not no_normalize,
        volume=volume,
    )

    stats = SynthesisStats()
    start = time.perf_counter()
    with wave.open(output, "wb") as wav_file:
        if stream:
            # header params are known upfront — setting them before the
            # first chunk means zero-chunk inputs or pre-first-chunk
            # engine errors don't die in Wave_write.close() with a
            # misleading "# channels not specified"
            wav_file.setframerate(voice.config.sample_rate)
            wav_file.setsampwidth(2)
            wav_file.setnchannels(1)
            first = True
            for chunk in voice.synthesize_streaming(text, syn_config):
                if first:
                    LOG.info("first audio after %.3fs",
                             time.perf_counter() - start)
                    first = False
                wav_file.writeframes(chunk.audio_int16_bytes)
        else:
            voice.synthesize_wav(text, wav_file, syn_config)
    elapsed = time.perf_counter() - start

    with wave.open(output, "rb") as wav_file:
        audio_s = wav_file.getnframes() / wav_file.getframerate()
    stats.record(elapsed, audio_s)
    if show_stats:
        print(stats.summary(), file=sys.stderr)
    LOG.info("wrote %s (%.2fs audio in %.2fs)", output, audio_s, elapsed)


if __name__ == "__main__":
    main()
