"""Export CLI: trained checkpoint -> distributable voice.

Equivalent of phoonnx_train/export_onnx.py: writes a ``model.onnx``
container whose initializers carry the reference state_dict names (so both
phoonnx_tpu and any name-based importer can load it), with the exporter's
metadata_props (export_onnx.py:335-350), plus the side outputs:

* ``<name>.tokens.txt`` — sherpa-style token table (export_onnx.py:57-94)
* ``<name>.piper.json`` — piper-compatible config for ipa+espeak voices
  (export_onnx.py:97-130)

Weight-norm is folded for the decoder (the reference calls
dec.remove_weight_norm before export, export_onnx.py:242-245); other
weight-normed modules keep (v, g) pairs exactly like the reference graph.

Usage:
    python -m phoonnx_tpu.train.export --checkpoint out/checkpoints/step_N \
        --config out/config.json --output-dir exported/
"""

import json
import logging
from pathlib import Path
from typing import Any, Dict

import click
import numpy as np

LOG = logging.getLogger("export")


def fold_decoder_weight_norm(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold (v, g) -> weight in the HiFi-GAN decoder subtree."""
    from phoonnx_tpu.models.vits import nn

    def fold(node):
        if isinstance(node, dict):
            if "weight_v" in node:
                folded = {k: v for k, v in node.items()
                          if k not in ("weight_v", "weight_g")}
                folded["weight"] = nn.weight_norm(
                    node["weight_v"], node["weight_g"]
                )
                return folded
            return {k: fold(v) for k, v in node.items()}
        if isinstance(node, list):
            return [fold(v) for v in node]
        return node

    out = dict(params)
    out["dec"] = fold(params["dec"])
    return out


def export_tokens(phoneme_id_map: Dict[str, Any], output_path: Path) -> None:
    """sherpa tokens.txt: ``PHONEME<space>ID`` per line."""
    with open(output_path, "w", encoding="utf-8") as f:
        for phoneme, ids in phoneme_id_map.items():
            id_value = ids[0] if isinstance(ids, (list, tuple)) else ids
            f.write(f"{phoneme} {id_value}\n")


def convert_to_piper(config: Dict[str, Any], output_path: Path) -> None:
    """Piper-compatible voice config for ipa+espeak models."""
    phoneme_id_map = {
        k: v if isinstance(v, list) else [v]
        for k, v in config.get("phoneme_id_map", {}).items()
    }
    piper_config = {
        "audio": {
            "sample_rate": config.get("audio", {}).get("sample_rate", 22050),
            "quality": config.get("audio", {}).get("quality", "medium"),
        },
        "espeak": {"voice": config.get("lang_code", "en")},
        "language": {"code": config.get("lang_code", "en")},
        "inference": config.get("inference", {}),
        "phoneme_type": "espeak",
        "phoneme_map": {},
        "phoneme_id_map": phoneme_id_map,
        "num_symbols": config.get("num_symbols", len(phoneme_id_map)),
        "num_speakers": config.get("num_speakers", 1),
        "speaker_id_map": config.get("speaker_id_map", {}),
        "piper_version": "1.0.0",
    }
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(piper_config, f, ensure_ascii=False, indent=2)


def run_export(
    checkpoint: str,
    config_path: str,
    output_dir: str,
    quality: str = "medium",
    generate_tokens: bool = False,
    piper: bool = False,
    executable_graph: bool = True,
    quantize: bool = False,
) -> Path:
    from phoonnx_tpu.models.vits.load import params_to_flat
    from phoonnx_tpu.onnx.writer import write_onnx
    from phoonnx_tpu.train.checkpoint import restore_generator
    from phoonnx_tpu.train.trainer import build_hparams

    with open(config_path, encoding="utf-8") as f:
        config = json.load(f)
    hp = build_hparams(config, quality)

    params_g = restore_generator(checkpoint, hp)
    params = fold_decoder_weight_norm(params_g)
    flat = params_to_flat(params)

    output_path = Path(output_dir)
    output_path.mkdir(parents=True, exist_ok=True)
    name = Path(checkpoint).name
    model_output = output_path / f"{name}.onnx"

    alphabet = config.get("alphabet", "")
    phoneme_type = config.get("phoneme_type", "")
    metadata = {
        "model_type": "vits",
        "n_speakers": str(hp.n_speakers),
        "n_vocab": str(hp.n_vocab),
        "sample_rate": str(hp.sample_rate),
        "alphabet": alphabet,
        "phoneme_type": phoneme_type,
        "phonemizer_model": config.get("phonemizer_model") or "",
        "phoneme_id_map": json.dumps(
            config.get("phoneme_id_map", {}), ensure_ascii=False
        ),
        "has_espeak": str(phoneme_type == "espeak"),
        "decoder_type": hp.decoder_type,
        "istft_hop": str(hp.istft_hop),
        "istft_n_fft": str(hp.istft_n_fft),
        "istft_bands": str(hp.istft_bands),
    }
    if alphabet == "ipa" and phoneme_type == "espeak":
        metadata["comment"] = "piper"

    if executable_graph:
        # Full opset-15 inference graph: runs under onnxruntime (piper
        # ecosystem) and under phoonnx_tpu's executor; the initializers
        # keep the reference names so it also reloads as a weight source.
        from phoonnx_tpu.onnx.vits_graph import export_vits_onnx

        export_vits_onnx(
            {k: np.asarray(v) for k, v in flat.items()}, hp,
            str(model_output), metadata=metadata, quantize=quantize,
        )
    else:
        weights = {k: np.asarray(v) for k, v in flat.items()}
        if quantize:
            from phoonnx_tpu.onnx.dequant import quantize_flat

            weights, n_q = quantize_flat(weights)
            if n_q:
                metadata["quantization"] = "int8-weights"
        inputs = [("input", np.int64, ("N", "T")),
                  ("input_lengths", np.int64, ("N",)),
                  ("scales", np.float32, (3,))]
        if hp.n_speakers > 1:
            inputs.append(("sid", np.int64, ("N",)))
        write_onnx(
            str(model_output),
            weights,
            metadata=metadata,
            inputs=inputs,
            outputs=[("output", np.float32, ("N", 1, "T_audio"))],
        )
    LOG.info("wrote %s (%d tensors)", model_output, len(flat))

    # config.json alongside the model for TTSVoice.load
    with open(f"{model_output}.json", "w", encoding="utf-8") as f:
        json.dump(config, f, ensure_ascii=False, indent=2)

    if generate_tokens:
        export_tokens(config.get("phoneme_id_map", {}),
                      output_path / f"{name}.tokens.txt")
    if piper:
        if not (alphabet == "ipa" and phoneme_type == "espeak"):
            LOG.warning(
                "only ipa+espeak voices are piper compatible; exporting "
                "anyway"
            )
        convert_to_piper(config, output_path / f"{name}.piper.json")
    return model_output


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option("--checkpoint", required=True)
@click.option("--config", "config_path", required=True)
@click.option("--output-dir", required=True)
@click.option("--quality", default="medium")
@click.option("--generate-tokens", is_flag=True)
@click.option("--piper", is_flag=True)
@click.option("--weights-only", "executable_graph", flag_value=False,
              default=True, help="Write a weights-only container instead "
              "of the executable inference graph")
@click.option("--quantize", is_flag=True,
              help="int8 weight-only quantization (~4x smaller model; "
              "QDQ triples, loads back to the compiled engine and runs "
              "under onnxruntime)")
@click.option("--debug", is_flag=True)
def main(**kwargs) -> None:
    debug = kwargs.pop("debug", False)
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)
    run_export(**kwargs)


if __name__ == "__main__":
    main()
