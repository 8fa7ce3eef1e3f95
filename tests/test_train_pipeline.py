"""Integration: preprocess -> dataset -> train -> checkpoint -> export -> load.

Uses the 'micro' model preset and a tiny synthetic corpus so the whole loop
runs in CI without audio assets or espeak.
"""

import json
import math
import wave
from pathlib import Path

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic LJSpeech-style corpus: 6 sine-tone WAVs + metadata."""
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    texts = ["hello world", "testing one two", "the quick brown fox",
             "jumped over", "a lazy dog", "goodbye now"]
    sr = 16000
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(texts):
        t = np.arange(int(sr * 0.5)) / sr
        freq = 150 + 40 * i
        audio = (0.4 * np.sin(2 * math.pi * freq * t)
                 + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        with wave.open(str(wav_dir / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        lines.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


@pytest.fixture(scope="module")
def preprocessed(corpus, tmp_path_factory):
    from phoonnx_tpu.train.preprocess import run_preprocess

    out = tmp_path_factory.mktemp("dataset")
    run_preprocess(
        input_dir=str(corpus),
        output_dir=str(out),
        language="en",
        phoneme_type="graphemes",
        alphabet="unicode",
        sample_rate=16000,
        max_workers=2,
        single_speaker=True,
        n_fft=128, hop_length=16, win_length=128,
    )
    return out


def test_preprocess_outputs(preprocessed):
    config = json.loads((preprocessed / "config.json").read_text())
    assert config["num_speakers"] == 1
    assert config["phoneme_type"] == "graphemes"
    assert config["audio"]["sample_rate"] == 16000
    id_map = config["phoneme_id_map"]
    assert id_map["_"] == 0 and id_map["^"] == 1 and id_map["$"] == 2

    lines = (preprocessed / "dataset.jsonl").read_text().strip().split("\n")
    assert len(lines) == 6
    utt = json.loads(lines[0])
    assert utt["phoneme_ids"]
    assert Path(utt["audio_norm_path"]).exists()
    assert Path(utt["audio_spec_path"]).exists()
    spec = np.load(utt["audio_spec_path"])
    assert spec.shape[1] == 65  # n_fft 128 -> 65 bins
    audio = np.load(utt["audio_norm_path"])
    assert audio.ndim == 1 and len(audio) > 0


@pytest.mark.slow
def test_train_export_load_roundtrip(preprocessed, tmp_path):
    """One real training step on the micro model, checkpoint, export, and
    reload through the public TTSVoice API."""
    from phoonnx_tpu.models.vits.model import VitsHParams
    from phoonnx_tpu.train import checkpoint as ckpt
    from phoonnx_tpu.train.dataset import BucketedLoader, load_dataset
    from phoonnx_tpu.train.export import run_export
    from phoonnx_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    config = json.loads((preprocessed / "config.json").read_text())
    hp = VitsHParams.preset(
        "micro", n_vocab=config["num_symbols"], sample_rate=16000,
    )
    utterances = load_dataset([preprocessed / "dataset.jsonl"])
    loader = BucketedLoader(
        utterances, batch_size=2, segment_size_frames=hp.segment_size,
        hop_length=hp.hop_length, spec_pad_multiple=32,
    )
    cfg = TrainConfig(steps_per_epoch=3, disc_periods=(2, 3),
                      disc_channel_scale=4)
    state = init_train_state(jax.random.PRNGKey(0), hp, cfg)

    batch = next(iter(loader.epoch()))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), hp, cfg)
    assert np.isfinite(float(metrics["loss_gen_all"]))

    # checkpoint round trip
    ckpt_path = ckpt.save(str(tmp_path / "ckpts"), state, hp, config)
    restored = ckpt.restore(ckpt_path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params_g["enc_p"]["emb"]["weight"]),
        np.asarray(state.params_g["enc_p"]["emb"]["weight"]),
    )

    # export + reload through the public API
    model_path = run_export(
        checkpoint=ckpt_path,
        config_path=str(preprocessed / "config.json"),
        output_dir=str(tmp_path / "exported"),
        quality="micro",
        generate_tokens=True,
        piper=True,
    )
    assert model_path.exists()
    assert (model_path.parent / f"{Path(ckpt_path).name}.tokens.txt").exists()
    assert (model_path.parent / f"{Path(ckpt_path).name}.piper.json").exists()

    from phoonnx_tpu import SynthesisConfig, TTSVoice

    voice = TTSVoice.load(str(model_path))
    audio = voice.phoneme_ids_to_audio(
        [1, 0, 5, 6, 7, 0, 2], SynthesisConfig(seed=0)
    )
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()

    # int8 export: smaller on disk, still loads onto the compiled engine
    from phoonnx_tpu.infer.engine import VitsEngine

    q_path = run_export(
        checkpoint=ckpt_path,
        config_path=str(preprocessed / "config.json"),
        output_dir=str(tmp_path / "exported_int8"),
        quality="micro",
        quantize=True,
    )
    assert q_path.stat().st_size < model_path.stat().st_size * 0.6
    q_voice = TTSVoice.load(str(q_path))
    assert isinstance(q_voice.engine, VitsEngine)
    q_audio = q_voice.phoneme_ids_to_audio(
        [1, 0, 5, 6, 7, 0, 2], SynthesisConfig(seed=0)
    )
    assert np.isfinite(q_audio).all() and len(q_audio) > 0


@pytest.mark.slow
def test_trainer_loop_with_profile(preprocessed, tmp_path):
    """The real trainer loop (run_training): one epoch on the micro
    preset with shrunk discriminators, plus a jax.profiler trace."""
    from phoonnx_tpu.train.trainer import run_training

    profile_dir = tmp_path / "trace"
    run_training(
        dataset_dir=str(preprocessed), quality="micro", batch_size=2,
        max_epochs=2, checkpoint_epochs=1, validation_split=0.3,
        num_test_examples=1, log_every=1,
        disc_periods=(2,), disc_channel_scale=4,
        profile_dir=str(profile_dir), profile_steps=1,
    )
    ckpts = list((preprocessed / "checkpoints").glob("*.npz"))
    assert ckpts, "trainer should have written a checkpoint"
    # held-out test utterances produce progress audio each validation
    # (reference validation_step, lightning.py:286-304)
    wavs = list((preprocessed / "test_audio").rglob("*.wav"))
    assert wavs, "trainer should have written test-utterance audio"
    # the profiler trace directory must contain at least one trace file
    assert any(profile_dir.rglob("*.pb")) or any(profile_dir.rglob("*"))


@pytest.mark.slow
def test_trainer_loop_auto_layouts(preprocessed, tmp_path, caplog):
    """Unmeshed trainer run (batch 1 -> gcd(1, devices) = 1) exercises
    the XLA-chosen (AUTO) train-state layout path: the first bucket's
    executable is reused, other buckets pin the learned formats, and
    checkpoints still save."""
    import logging

    from phoonnx_tpu.train.trainer import run_training

    with caplog.at_level(logging.INFO, logger="trainer"):
        run_training(
            dataset_dir=str(preprocessed), quality="micro", batch_size=1,
            max_epochs=1, checkpoint_epochs=1, validation_split=0.3,
            num_test_examples=0, log_every=1,
            disc_periods=(2,), disc_channel_scale=4,
        )
    assert any("layouts pinned" in r.message for r in caplog.records), \
        "AUTO-layout path must engage (not fall back) on unmeshed runs"
    ckpts = list((preprocessed / "checkpoints").glob("*.npz"))
    assert ckpts, "trainer should have written a checkpoint"


@pytest.mark.slow
def test_checkpoint_resume_bit_equivalence(preprocessed, tmp_path):
    """train(2 epochs) == train(1 epoch) + save + restore + train(1):
    params, both optimizer states, rng folding, and the LR-schedule step
    must all be identical — the property that makes preemptible-TPU
    training safe (Lightning resume semantics,
    phoonnx_train/train.py:91). Compares the step-6 checkpoints of the
    continuous and the resumed run array-for-array."""
    import shutil

    from phoonnx_tpu.train.trainer import run_training

    def fresh_dataset(name):
        d = tmp_path / name
        d.mkdir()
        shutil.copy(preprocessed / "config.json", d / "config.json")
        shutil.copy(preprocessed / "dataset.jsonl", d / "dataset.jsonl")
        return d

    kwargs = dict(
        quality="micro", batch_size=2, checkpoint_epochs=1,
        validation_split=0.0, num_test_examples=0, log_every=100,
        disc_periods=(2,), disc_channel_scale=4, seed=77,
    )

    cont = fresh_dataset("continuous")
    run_training(dataset_dir=str(cont), max_epochs=2, **kwargs)

    resumed = fresh_dataset("resumed")
    run_training(dataset_dir=str(resumed), max_epochs=1, **kwargs)
    mid = resumed / "checkpoints" / "step_3.npz"
    assert mid.exists(), "epoch-1 checkpoint missing"
    run_training(dataset_dir=str(resumed), max_epochs=2,
                 resume_from_checkpoint=str(mid), **kwargs)

    a = np.load(cont / "checkpoints" / "step_6.npz")
    b = np.load(resumed / "checkpoints" / "step_6.npz")
    assert sorted(a.files) == sorted(b.files)
    mismatched = [k for k in a.files
                  if not np.array_equal(a[k], b[k], equal_nan=True)]
    assert not mismatched, (
        f"{len(mismatched)}/{len(a.files)} leaves differ after resume, "
        f"e.g. {mismatched[:8]}")


def test_epoch_indexed_shuffle_is_stateless(preprocessed):
    """epoch(epoch_index=N) must be a pure function of (seed, N) — the
    loader's stateful rng must not leak into indexed epochs."""
    from phoonnx_tpu.train.dataset import BucketedLoader, load_dataset

    utts = load_dataset([preprocessed / "dataset.jsonl"])
    mk = lambda: BucketedLoader(  # noqa: E731
        utts, batch_size=2, segment_size_frames=64, hop_length=16,
        seed=5, spec_pad_multiple=32)

    l1, l2 = mk(), mk()
    list(l1.epoch())  # advance l1's stateful rng
    for e in range(2):
        b1 = [b["phoneme_ids"] for b in l1.epoch(epoch_index=e)]
        b2 = [b["phoneme_ids"] for b in l2.epoch(epoch_index=e)]
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x, y)
    # different epochs shuffle differently. 6 utts fit one length-sort
    # window (batch_size*16) where sorting cancels the shuffle, so
    # replicate to 120 utts -> 4 windows whose membership (and thus the
    # sorted length profile) depends on the epoch permutation.
    big = BucketedLoader(
        utts * 20, batch_size=2, segment_size_frames=64, hop_length=16,
        seed=5, spec_pad_multiple=32)
    e0 = np.concatenate([b["phoneme_lengths"]
                         for b in big.epoch(epoch_index=0)])
    e1 = np.concatenate([b["phoneme_lengths"]
                         for b in big.epoch(epoch_index=1)])
    assert not np.array_equal(e0, e1)


def test_mb_istft_decoder_train_and_reload():
    """Multi-band iSTFT decoder (arXiv:2210.15975): train step, flat
    round-trip with band inference, inference length contract."""
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits.load import (
        infer_hparams_from_flat,
        params_from_flat,
        params_to_flat,
    )
    from phoonnx_tpu.models.vits.model import (
        VitsHParams,
        infer,
        random_params,
    )
    from phoonnx_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    hp = VitsHParams.preset(
        "micro", n_vocab=40, decoder_type="istft",
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        istft_n_fft=16, istft_hop=2, istft_bands=2,
    )
    assert hp.total_upsample == hp.hop_length  # 4 * 2 * 2 == 16

    cfg = TrainConfig(steps_per_epoch=3, disc_periods=(2,),
                      disc_channel_scale=4)
    state = init_train_state(jax.random.PRNGKey(0), hp, cfg)
    rng = np.random.default_rng(0)
    t_x, t_y = 8, 32
    batch = {
        "phoneme_ids": jnp.asarray(rng.integers(1, 40, (2, t_x)), jnp.int32),
        "phoneme_lengths": jnp.asarray([8, 6], jnp.int32),
        "spec": jnp.asarray(
            (rng.standard_normal((2, t_y, hp.spec_channels)) ** 2
             ).astype(np.float32)),
        "spec_lengths": jnp.asarray([32, 28], jnp.int32),
        "audio": jnp.asarray(
            (rng.standard_normal((2, t_y * hp.hop_length)) * 0.1
             ).astype(np.float32)),
    }
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), hp, cfg)
    assert np.isfinite(float(metrics["loss_gen_all"]))

    flat = params_to_flat(state.params_g)
    # mag head carries bands * (n_fft/2 + 1) output channels
    assert flat["dec.conv_mag.weight"].shape[0] == 2 * 9
    hp2 = infer_hparams_from_flat(flat, istft_hop=2, sample_rate=16000,
                                  hop_length=16, filter_length=128,
                                  win_length=128, spec_channels=65,
                                  segment_size=16)
    assert hp2.decoder_type == "istft"
    assert hp2.istft_bands == 2
    assert hp2.istft_n_fft == 16
    rebuilt = params_from_flat(flat, hp2, strict=False)
    audio, y_len, _ = infer(
        rebuilt, hp2, jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        max_frames=32, noise_scale=jnp.float32(0.667),
        length_scale=jnp.float32(1.0), noise_w=jnp.float32(0.8),
        rng=jax.random.PRNGKey(2),
    )
    audio = np.asarray(audio)
    assert audio.shape[1] == 32 * hp2.total_upsample
    assert np.isfinite(audio).all()


def test_istft_decoder_train_and_reload(tmp_path):
    """iSTFT decoder family: train step, flat round-trip, inference."""
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits.load import (
        infer_hparams_from_flat,
        params_from_flat,
        params_to_flat,
    )
    from phoonnx_tpu.models.vits.model import (
        VitsHParams,
        infer,
        random_params,
    )
    from phoonnx_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    hp = VitsHParams.preset(
        "micro", n_vocab=40, decoder_type="istft",
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        istft_n_fft=16, istft_hop=4,
    )
    assert hp.total_upsample == hp.hop_length  # 4 * 4 == 16

    cfg = TrainConfig(steps_per_epoch=3, disc_periods=(2,),
                      disc_channel_scale=4)
    state = init_train_state(jax.random.PRNGKey(0), hp, cfg)
    rng = np.random.default_rng(0)
    t_x, t_y = 8, 32
    batch = {
        "phoneme_ids": jnp.asarray(rng.integers(1, 40, (2, t_x)), jnp.int32),
        "phoneme_lengths": jnp.asarray([8, 6], jnp.int32),
        "spec": jnp.asarray(
            (rng.standard_normal((2, t_y, hp.spec_channels)) ** 2
             ).astype(np.float32)),
        "spec_lengths": jnp.asarray([32, 28], jnp.int32),
        "audio": jnp.asarray(
            (rng.standard_normal((2, t_y * hp.hop_length)) * 0.1
             ).astype(np.float32)),
    }
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), hp, cfg)
    assert np.isfinite(float(metrics["loss_gen_all"]))

    # flat round-trip preserves the istft decoder
    flat = params_to_flat(state.params_g)
    assert "dec.conv_mag.weight" in flat
    hp2 = infer_hparams_from_flat(flat, istft_hop=4, sample_rate=16000,
                                  hop_length=16, filter_length=128,
                                  win_length=128, spec_channels=65,
                                  segment_size=16)
    assert hp2.decoder_type == "istft"
    assert hp2.istft_n_fft == 16
    rebuilt = params_from_flat(flat, hp2, strict=False)
    audio, y_len, _ = infer(
        rebuilt, hp2, jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        max_frames=32, noise_scale=jnp.float32(0.667),
        length_scale=jnp.float32(1.0), noise_w=jnp.float32(0.8),
        rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(audio)).all()


def test_collate_spec_orientation(tmp_path):
    """Native caches are [T, F]; reference .pt caches are [F, T]. The
    collate must orient by channel count — a min/max heuristic flips any
    native clip shorter than F frames (~6 s at 22.05 kHz)."""
    import numpy as np

    from phoonnx_tpu.train.dataset import BucketedLoader, Utterance

    channels = 65
    rng = np.random.default_rng(0)

    def make_utt(i, spec):
        spec_path = tmp_path / f"spec{i}.npy"
        audio_path = tmp_path / f"audio{i}.npy"
        np.save(spec_path, spec)
        np.save(audio_path, rng.normal(size=spec.shape[0] * 4
                                       if spec.shape[1] == channels
                                       else spec.shape[1] * 4
                                       ).astype(np.float32))
        return Utterance(phoneme_ids=[1, 2, 3],
                         audio_norm_path=audio_path,
                         audio_spec_path=spec_path, text="x")

    # one SHORT native [T=20, F=65] cache and one reference [F=65, T=40]
    native = rng.normal(size=(20, channels)).astype(np.float32)
    ref_style = rng.normal(size=(channels, 40)).astype(np.float32)
    loader = BucketedLoader(
        [make_utt(0, native), make_utt(1, ref_style)],
        batch_size=2, segment_size_frames=8, hop_length=4,
        spec_pad_multiple=8, spec_channels=channels,
    )
    batch = loader.collate(loader.utterances)
    assert batch["spec"].shape[2] == channels
    assert batch["spec_lengths"].tolist() == [20, 40]
    np.testing.assert_allclose(batch["spec"][0, :20], native)
    np.testing.assert_allclose(batch["spec"][1, :40], ref_style.T)

    # channel count unknown: the 2^k+1 rule still orients both correctly
    loader2 = BucketedLoader(
        [make_utt(0, native), make_utt(1, ref_style)],
        batch_size=2, segment_size_frames=8, hop_length=4,
        spec_pad_multiple=8,
    )
    batch2 = loader2.collate(loader2.utterances)
    assert batch2["spec"].shape[2] == channels
    assert batch2["spec_lengths"].tolist() == [20, 40]


def test_loader_prefetch_equivalence(tmp_path):
    """epoch(prefetch=N) must yield the same batches as the synchronous
    path (same shuffle seed), just produced by a background thread."""
    import numpy as np

    from phoonnx_tpu.train.dataset import BucketedLoader, Utterance

    utts = []
    for i in range(7):
        spec = np.random.randn(10 + i, 9).astype(np.float32)
        sp, ap = tmp_path / f"s{i}.npy", tmp_path / f"a{i}.npy"
        np.save(sp, spec)
        np.save(ap, np.random.randn(spec.shape[0] * 4).astype(np.float32))
        utts.append(Utterance(phoneme_ids=[1, 2], audio_norm_path=ap,
                              audio_spec_path=sp))

    def run(prefetch):
        loader = BucketedLoader(
            utts, batch_size=2, segment_size_frames=4, hop_length=4,
            spec_pad_multiple=4, spec_channels=9,
        )
        return list(loader.epoch(prefetch=prefetch))

    plain, threaded = run(0), run(2)
    assert len(plain) == len(threaded)
    for a, b in zip(plain, threaded):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


def test_read_ljspeech_stray_pipe_stays_single_speaker(tmp_path):
    """One stray '|' inside a 2-column row's text must not become a
    speaker name and flip the corpus to multispeaker (found by review);
    the column layout is a corpus property decided by the first row."""
    import wave as _wave

    from phoonnx_tpu.train.preprocess import read_ljspeech

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for name in ("a", "b"):
        with _wave.open(str(wav_dir / f"{name}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(b"\x00\x00" * 1600)
    (tmp_path / "metadata.csv").write_text(
        "a|plain text\nb|left | right\n", encoding="utf-8")
    utts = list(read_ljspeech(tmp_path))
    assert [u.speaker for u in utts] == [None, None]
    assert utts[1].text == "left | right"


def test_read_ljspeech_three_column_keeps_pipes_in_text(tmp_path):
    import wave as _wave

    from phoonnx_tpu.train.preprocess import read_ljspeech

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    with _wave.open(str(wav_dir / "a.wav"), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(b"\x00\x00" * 1600)
    (tmp_path / "metadata.csv").write_text(
        "a|spk1|text with | pipe\n", encoding="utf-8")
    utts = list(read_ljspeech(tmp_path))
    assert utts[0].speaker == "spk1"
    assert utts[0].text == "text with | pipe"


def test_cache_key_includes_spectrogram_params(tmp_path):
    """Re-running with different --n-fft must not serve the stale cache
    (found by review: the key was sha256 of the path only)."""
    import wave as _wave

    from phoonnx_tpu.train.audio import cache_norm_audio

    wav = tmp_path / "x.wav"
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
    with _wave.open(str(wav), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    cache = tmp_path / "cache"
    n1, s1 = cache_norm_audio(str(wav), str(cache), 16000, n_fft=512,
                              hop_length=128, win_length=512)
    n2, s2 = cache_norm_audio(str(wav), str(cache), 16000, n_fft=1024,
                              hop_length=256, win_length=1024)
    assert (n1, s1) != (n2, s2)
    assert np.load(s1).shape[1] != np.load(s2).shape[1]


def test_vad_model_resolution_env_var(tmp_path, monkeypatch):
    """PHOONNX_VAD_MODEL reaches the detector (spawn workers build their
    own detector; the env var is the cross-process channel)."""
    from phoonnx_tpu.train.audio import _resolve_vad_model

    monkeypatch.delenv("PHOONNX_VAD_MODEL", raising=False)
    assert _resolve_vad_model("explicit.onnx") == "explicit.onnx"
    monkeypatch.setenv("PHOONNX_VAD_MODEL", str(tmp_path / "m.onnx"))
    assert _resolve_vad_model() == str(tmp_path / "m.onnx")
