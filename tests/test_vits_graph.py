"""Executable ONNX graph export: round-trip vs JAX inference."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits.load import params_to_flat
from phoonnx_tpu.models.vits.model import infer, random_params
from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.vits_graph import export_vits_onnx

from .test_voice_e2e import SMALL_HP


def _roundtrip(hp, params, feeds, tmp_path, deterministic=True):
    flat = params_to_flat(params)
    path = tmp_path / "graph.onnx"
    export_vits_onnx(flat, hp, str(path), deterministic=deterministic,
                     metadata={"model_type": "vits"})
    model = read_onnx(str(path))
    assert model.metadata["model_type"] == "vits"
    return OnnxExecutor(model).run(feeds)[0]


def test_graph_matches_jax(tmp_path):
    hp = SMALL_HP
    params = random_params(jax.random.PRNGKey(0), hp)
    ids = np.array([[1, 5, 9, 3, 7, 2, 11, 13]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.array([8], np.int64),
        "scales": np.array([0.667, 1.0, 0.8], np.float32),
    }
    audio = _roundtrip(hp, params, feeds, tmp_path)
    assert audio.ndim == 3 and audio.shape[1] == 1

    frames = audio.shape[-1] // hp.total_upsample
    jax_audio, y_len, _ = infer(
        params, hp, jnp.asarray(ids.astype(np.int32)), jnp.asarray([8]),
        max_frames=frames,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w=jnp.float32(0.8),
        dp_noise=jnp.zeros((1, 8, 2)),
        prior_noise=jnp.zeros((1, frames, hp.inter_channels)),
    )
    n = int(y_len[0]) * hp.total_upsample
    deviation = np.abs(audio[0, 0, :n] - np.asarray(jax_audio)[0, :n]).max()
    assert deviation < 1e-4, deviation


def test_graph_multispeaker(tmp_path):
    hp = replace(SMALL_HP, n_speakers=3, gin_channels=16)
    params = random_params(jax.random.PRNGKey(1), hp)
    ids = np.array([[2, 4, 6, 8, 10, 12]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.array([6], np.int64),
        "scales": np.array([0.5, 1.2, 0.6], np.float32),
        "sid": np.array([1], np.int64),
    }
    audio = _roundtrip(hp, params, feeds, tmp_path)
    assert audio.shape[1] == 1 and audio.shape[-1] > 0

    frames = audio.shape[-1] // hp.total_upsample
    jax_audio, y_len, _ = infer(
        params, hp, jnp.asarray(ids.astype(np.int32)), jnp.asarray([6]),
        max_frames=frames,
        noise_scale=jnp.float32(0.5), length_scale=jnp.float32(1.2),
        noise_w=jnp.float32(0.6), sid=jnp.asarray([1]),
        dp_noise=jnp.zeros((1, 6, 2)),
        prior_noise=jnp.zeros((1, frames, hp.inter_channels)),
    )
    n = int(y_len[0]) * hp.total_upsample
    deviation = np.abs(audio[0, 0, :n] - np.asarray(jax_audio)[0, :n]).max()
    assert deviation < 1e-4, deviation


def test_graph_stochastic_mode_runs(tmp_path):
    """Production graph (RandomNormalLike noise) executes end-to-end."""
    hp = SMALL_HP
    params = random_params(jax.random.PRNGKey(0), hp)
    ids = np.array([[1, 5, 9, 3]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.array([4], np.int64),
        "scales": np.array([0.667, 1.0, 0.8], np.float32),
    }
    audio = _roundtrip(hp, params, feeds, tmp_path, deterministic=False)
    assert np.isfinite(audio).all()
    assert audio.shape[-1] % hp.total_upsample == 0


def test_graph_reloads_as_weights(tmp_path):
    """The executable graph doubles as a weight container for TTSVoice."""
    from phoonnx_tpu.models.vits.load import (
        infer_hparams_from_flat,
        params_from_flat,
    )

    hp = SMALL_HP
    params = random_params(jax.random.PRNGKey(0), hp)
    path = tmp_path / "graph.onnx"
    export_vits_onnx(params_to_flat(params), hp, str(path))
    model = read_onnx(str(path))
    hp2 = infer_hparams_from_flat(model.initializers)
    assert hp2.n_vocab == hp.n_vocab
    assert hp2.upsample_rates == hp.upsample_rates
    rebuilt = params_from_flat(model.initializers, hp2, strict=False)
    np.testing.assert_array_equal(
        np.asarray(rebuilt["enc_p"]["emb"]["weight"]),
        np.asarray(params["enc_p"]["emb"]["weight"]),
    )


def _istft_hp(bands):
    from phoonnx_tpu.models.vits.model import VitsHParams

    return VitsHParams.preset(
        "micro", n_vocab=SMALL_HP.n_vocab, decoder_type="istft",
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        istft_n_fft=16, istft_hop=4 // bands if bands == 1 else 2,
        istft_bands=bands,
    )


@pytest.mark.parametrize("bands", [1, 2])
def test_graph_istft_decoder_matches_jax(bands, tmp_path):
    """iSTFT and MB-iSTFT voices export as EXECUTABLE graphs too: the
    inverse rFFT is two fixed MatMuls, overlap-add and the PQMF synthesis
    bank are ConvTransposes — all opset-15 ops."""
    hp = _istft_hp(bands)
    params = random_params(jax.random.PRNGKey(3), hp)
    ids = np.array([[1, 5, 9, 3, 7, 2, 11, 13]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.array([8], np.int64),
        "scales": np.array([0.667, 1.0, 0.8], np.float32),
    }
    audio = _roundtrip(hp, params, feeds, tmp_path)
    assert audio.ndim == 3 and audio.shape[1] == 1
    assert audio.shape[-1] % hp.total_upsample == 0

    frames = audio.shape[-1] // hp.total_upsample
    jax_audio, y_len, _ = infer(
        params, hp, jnp.asarray(ids.astype(np.int32)), jnp.asarray([8]),
        max_frames=frames,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w=jnp.float32(0.8),
        dp_noise=jnp.zeros((1, 8, 2)),
        prior_noise=jnp.zeros((1, frames, hp.inter_channels)),
    )
    n = int(y_len[0]) * hp.total_upsample
    deviation = np.abs(audio[0, 0, :n] - np.asarray(jax_audio)[0, :n]).max()
    assert deviation < 1e-4, deviation


def test_graph_istft_multispeaker(tmp_path):
    """Speaker conditioning flows through the iSTFT trunk in the
    executable graph too."""
    from dataclasses import replace as _replace

    hp = _replace(_istft_hp(2), n_speakers=3, gin_channels=16)
    params = random_params(jax.random.PRNGKey(5), hp)
    ids = np.array([[2, 4, 6, 8, 10, 12]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.array([6], np.int64),
        "scales": np.array([0.5, 1.2, 0.6], np.float32),
        "sid": np.array([2], np.int64),
    }
    audio = _roundtrip(hp, params, feeds, tmp_path)
    assert audio.shape[1] == 1 and audio.shape[-1] > 0

    frames = audio.shape[-1] // hp.total_upsample
    jax_audio, y_len, _ = infer(
        params, hp, jnp.asarray(ids.astype(np.int32)), jnp.asarray([6]),
        max_frames=frames,
        noise_scale=jnp.float32(0.5), length_scale=jnp.float32(1.2),
        noise_w=jnp.float32(0.6), sid=jnp.asarray([2]),
        dp_noise=jnp.zeros((1, 6, 2)),
        prior_noise=jnp.zeros((1, frames, hp.inter_channels)),
    )
    n = int(y_len[0]) * hp.total_upsample
    deviation = np.abs(audio[0, 0, :n] - np.asarray(jax_audio)[0, :n]).max()
    assert deviation < 1e-4, deviation


def test_quantized_graph_matches_dequantized_weights(tmp_path):
    """quantize=True writes int8 QDQ weight triples + DequantizeLinear
    nodes; the executed graph is bit-identical to a float graph built
    from the dequantized weights (same f32 math after reconstruction)."""
    from phoonnx_tpu.onnx.dequant import dequantize_flat

    hp = SMALL_HP
    params = random_params(jax.random.PRNGKey(2), hp)
    flat = {k: np.asarray(v) for k, v in params_to_flat(params).items()}
    feeds = {
        "input": np.array([[1, 5, 9, 3, 7, 2, 11, 13]], np.int64),
        "input_lengths": np.array([8], np.int64),
        "scales": np.array([0.667, 1.0, 0.8], np.float32),
    }

    qpath = tmp_path / "quant.onnx"
    export_vits_onnx(flat, hp, str(qpath), deterministic=True,
                     metadata={"model_type": "vits"}, quantize=True)
    qmodel = read_onnx(str(qpath))
    assert qmodel.metadata.get("quantization") == "int8-weights-qdq"
    n_int8 = sum(1 for v in qmodel.initializers.values()
                 if v.dtype == np.int8 and v.ndim >= 2)
    assert n_int8 > 10  # the conv/matmul weights actually quantized
    q_audio = OnnxExecutor(qmodel).run(feeds)[0]

    # float graph over the reconstructed weights
    restored, n_deq = dequantize_flat(qmodel.initializers)
    assert n_deq == n_int8
    weights = {k: v for k, v in restored.items() if k in flat
               or k.endswith(".weight")}
    fpath = tmp_path / "dequant.onnx"
    export_vits_onnx(weights, hp, str(fpath), deterministic=True,
                     metadata={"model_type": "vits"})
    f_audio = OnnxExecutor(read_onnx(str(fpath))).run(feeds)[0]
    np.testing.assert_array_equal(q_audio, f_audio)

    # size: int8 container is ~4x smaller than the float export
    full = tmp_path / "full.onnx"
    export_vits_onnx(flat, hp, str(full), deterministic=True,
                     metadata={"model_type": "vits"})
    assert qpath.stat().st_size < full.stat().st_size * 0.45


def test_exported_graph_io_carries_type_info():
    """Graph inputs/outputs must be FULL ValueInfoProto (name + TypeProto
    with elem_type and shape): the ONNX IR requires it and onnxruntime
    refuses to load name-only io ("Input must have type info") — found
    by review; the in-repo reader tolerated the omission so no test
    caught it. Walked at the wire level since the sandbox has no onnx
    package."""

    from phoonnx_tpu.onnx import wire

    hp = SMALL_HP
    params = random_params(jax.random.PRNGKey(0), hp)
    flat = {k: np.asarray(v) for k, v in params_to_flat(params).items()}
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/m.onnx"
        export_vits_onnx(flat, hp, path, metadata={})
        data = open(path, "rb").read()

    def fields(buf):
        return list(wire.iter_fields(buf))

    graphs = [v for f, _, v in fields(data) if f == 7]
    assert len(graphs) == 1
    ios = [v for f, _, v in fields(graphs[0]) if f in (11, 12)]
    assert len(ios) >= 4  # 3 inputs + 1 output
    for vi in ios:
        vi_fields = {f: v for f, _, v in fields(vi)}
        assert 1 in vi_fields, "value info missing name"
        assert 2 in vi_fields, (
            f"value info {vi_fields[1]!r} missing TypeProto")
        tensor_type = {f: v for f, _, v in fields(vi_fields[2])}[1]
        tt = {f: v for f, _, v in fields(tensor_type)}
        assert 1 in tt, "tensor_type missing elem_type"
        assert 2 in tt, "tensor_type missing shape"
        dims = [v for f, _, v in fields(tt[2]) if f == 1]
        assert dims, "shape has no dims"
        for d in dims:
            df = {f: (w, v) for f, w, v in fields(d)}
            assert 1 in df or 2 in df  # dim_value or dim_param
