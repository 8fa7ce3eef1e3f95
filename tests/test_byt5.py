"""ByT5 engine parity vs transformers' T5 implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from phoonnx_tpu.models import byt5  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    config = transformers.T5Config(
        vocab_size=384,
        d_model=32,
        d_kv=16,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=2,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        decoder_start_token_id=0,
        pad_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(config).eval()
    return model


@pytest.fixture(scope="module")
def engine(hf_model):
    named = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    # HF state dicts carry duplicated embedding references; keep canonical.
    named = {k: v for k, v in named.items()
             if not k.startswith(("encoder.embed_tokens",
                                  "decoder.embed_tokens"))}
    return byt5.ByT5Engine.from_flat(named, max_length=24,
                                     input_buckets=(16,))


def test_config_inference(engine):
    cfg = engine.cfg
    assert cfg.vocab_size == 384
    assert cfg.d_model == 32
    assert cfg.d_kv == 16
    assert cfg.num_heads == 2
    assert cfg.num_encoder_layers == 2
    assert cfg.num_decoder_layers == 2
    assert cfg.gated_ffn
    assert not cfg.tie_word_embeddings


def test_encoder_parity(hf_model, engine):
    ids = np.array([[10, 45, 99, 200, 7, 1, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int64)
    ours = np.asarray(byt5.encode(
        engine.params, engine.cfg, jnp.asarray(ids), jnp.asarray(mask)
    ))
    with torch.no_grad():
        theirs = hf_model.encoder(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_decoder_logits_parity(hf_model, engine):
    ids = np.array([[10, 45, 99, 1]], np.int64)
    mask = np.ones_like(ids)
    dec_ids = np.array([[0, 12, 30]], np.int64)
    enc = byt5.encode(engine.params, engine.cfg, jnp.asarray(ids),
                      jnp.asarray(mask))
    ours = np.asarray(byt5._decoder_logits_full(
        engine.params, engine.cfg, jnp.asarray(dec_ids), enc,
        jnp.asarray(mask),
    ))
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_greedy_decode_matches_hf_generate(hf_model, engine):
    ids = [10, 45, 99, 200, 7, 33, 120, 1]
    generated = engine.greedy_decode(ids)

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            max_length=25, num_beams=1, do_sample=False,
        )[0].numpy()
    # hf output starts with decoder_start (0); strip it and trailing pads
    hf_tokens = [int(t) for t in hf_out[1:]]
    # ours is the pre-EOS sequence: no EOS marker inside it
    assert 1 not in generated
    n = min(len(hf_tokens), len(generated))
    assert generated[:n] == hf_tokens[:n]


def test_kv_cache_consistency(engine):
    """Incremental decode must equal the full decoder pass."""
    ids = np.array([[5, 17, 254, 1]], np.int64)
    mask = np.ones_like(ids)
    generated = engine.greedy_decode([5, 17, 254, 1])
    # re-score the generated prefix with the full decoder
    dec_input = np.array([[0] + generated[:-1]], np.int64)
    enc = byt5.encode(engine.params, engine.cfg, jnp.asarray(ids),
                      jnp.asarray(mask))
    logits = np.asarray(byt5._decoder_logits_full(
        engine.params, engine.cfg, jnp.asarray(dec_input), enc,
        jnp.asarray(mask),
    ))
    rescored = logits.argmax(-1)[0].tolist()
    assert rescored == generated


def test_greedy_decode_batch_matches_single(engine):
    seqs = [[10, 45, 99, 1], [7, 8, 1], [200, 150, 90, 60, 30, 1]]
    batched = engine.greedy_decode_batch(seqs)
    singles = [engine.greedy_decode(s) for s in seqs]
    assert batched == singles


def test_model_auto_download(tmp_path, monkeypatch):
    """Known model names download to ~/.local/share/phoonnx on first use
    (reference mul.py:69-81); failures raise a clean IOError."""
    from phoonnx_tpu.phonemizers.mul import ByT5Phonemizer

    src = tmp_path / "fake_model.onnx"
    src.write_bytes(b"onnx-bytes")
    home = tmp_path / "home"
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.setattr(
        ByT5Phonemizer, "MODEL2URL",
        {"org/fake-model": src.as_uri()},
    )
    target = ByT5Phonemizer._download_model("org/fake-model")
    assert open(target, "rb").read() == b"onnx-bytes"
    assert str(home) in target
    # second call reuses the cached file
    assert ByT5Phonemizer._download_model("org/fake-model") == target

    # a dead URL surfaces as IOError with guidance, no partial file left
    monkeypatch.setattr(
        ByT5Phonemizer, "MODEL2URL",
        {"org/dead": (tmp_path / "missing.onnx").as_uri()},
    )
    with pytest.raises(IOError, match="manually"):
        ByT5Phonemizer._download_model("org/dead")


def test_bf16_engine_decodes(hf_model):
    named = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    named = {k: v for k, v in named.items()
             if not k.startswith(("encoder.embed_tokens",
                                  "decoder.embed_tokens"))}
    eng = byt5.ByT5Engine.from_flat(named, max_length=24,
                                    input_buckets=(16,), dtype="bfloat16")
    assert eng.params["shared"]["weight"].dtype == jnp.bfloat16
    out = eng.greedy_decode([10, 45, 99, 200, 7, 33, 120, 1])
    assert isinstance(out, list)
    assert all(isinstance(t, int) and 0 <= t < eng.cfg.vocab_size
               for t in out)
    assert 1 not in out  # pre-EOS sequence contract


def test_decode_budget_buckets(engine):
    # factor 4, floor 64, cap max_length(24): every input bucket hits 24
    fn16 = engine._decode_for(16)
    assert engine._decode_for(16) is fn16  # cached
    assert list(engine._decode_cache) == [24]
    # an uncapped engine buckets the budget by input size
    eng2 = byt5.ByT5Engine(engine.params, engine.cfg, max_length=512,
                           input_buckets=(16, 32, 128))
    eng2._decode_for(16)
    eng2._decode_for(128)
    assert sorted(eng2._decode_cache) == [64, 512]
    # factor None keeps the reference's flat budget
    eng3 = byt5.ByT5Engine(engine.params, engine.cfg, max_length=512,
                           max_length_factor=None)
    eng3._decode_for(16)
    assert list(eng3._decode_cache) == [512]
