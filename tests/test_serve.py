"""TTS HTTP server: dynamic batching, WAV and streaming-PCM responses.

Serving layer beyond the reference (phoonnx is library-only); the
batcher coalesces concurrent requests into one engine.synthesize_batch
call per scale group.
"""

import http.client
import io
import json
import threading
import wave

import numpy as np
import pytest

import jax

from phoonnx_tpu.models.vits import model as vits_model
from phoonnx_tpu.models.vits.load import params_to_flat
from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.onnx.writer import write_onnx
from phoonnx_tpu.serve import DynamicBatcher, TTSServer


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    from phoonnx_tpu import TTSVoice

    tmp = tmp_path_factory.mktemp("serve_voice")
    hp = VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    flat = params_to_flat(params)
    model_path = tmp / "model.onnx"
    write_onnx(
        str(model_path),
        {k: np.asarray(v) for k, v in flat.items()},
        metadata={"model_type": "vits", "sample_rate": "16000"},
        inputs=["input", "input_lengths", "scales"],
        outputs=["output"],
    )
    id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
    id_map.update({c: i + 4 for i, c in enumerate("abcdefghijklmnop")})
    config = {
        "phoneme_type": "raw",
        "lang_code": "en",
        "alphabet": "ipa",
        "phoneme_id_map": id_map,
        "num_symbols": len(id_map),
        "num_speakers": 1,
        "audio": {"sample_rate": 16000},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }
    config_path = tmp / "model.onnx.json"
    config_path.write_text(json.dumps(config), encoding="utf-8")
    return TTSVoice.load(str(model_path), str(config_path))


@pytest.fixture(scope="module")
def server(voice):
    srv = TTSServer(voice, port=0, max_batch=8, max_wait_ms=30.0)
    srv.start()
    yield srv
    srv.stop()


def _request(server, method, path, body=None):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_health(server):
    resp, data = _request(server, "GET", "/health")
    assert resp.status == 200
    payload = json.loads(data)
    assert payload["status"] == "ok"
    assert payload["sample_rate"] == 16000


def test_synthesize_wav(server):
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc def]]", "seed": 3})
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "audio/wav"
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert len(pcm) > 0
    assert np.abs(pcm).max() > 0


def test_synthesize_deterministic_seed(server):
    _, wav1 = _request(server, "POST", "/synthesize",
                       {"text": "[[abc]]", "seed": 42})
    _, wav2 = _request(server, "POST", "/synthesize",
                       {"text": "[[abc]]", "seed": 42})
    assert wav1 == wav2


def test_synthesize_stream_pcm(server):
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc def gah]]", "seed": 5,
                           "stream": True, "chunk_frames": 8,
                           "overlap_frames": 8})
    assert resp.status == 200
    assert resp.getheader("X-Sample-Rate") == "16000"
    pcm_stream = np.frombuffer(data, np.int16)
    assert len(pcm_stream) > 0

    # the streamed PCM must equal the batch path's audio for the seed
    resp, wav = _request(server, "POST", "/synthesize",
                         {"text": "[[abc def gah]]", "seed": 5})
    with wave.open(io.BytesIO(wav), "rb") as w:
        pcm_full = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert len(pcm_stream) == len(pcm_full)
    np.testing.assert_allclose(pcm_stream, pcm_full, atol=2)


def test_volume_consistent_between_routes(server):
    """Same request with/without stream must agree on loudness."""
    base = {"text": "[[abc def]]", "seed": 9}
    _, wav_half = _request(server, "POST", "/synthesize",
                           dict(base, volume=0.5))
    _, wav_full = _request(server, "POST", "/synthesize", base)
    with wave.open(io.BytesIO(wav_half), "rb") as w:
        pcm_half = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    with wave.open(io.BytesIO(wav_full), "rb") as w:
        pcm_full = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_allclose(pcm_half, (pcm_full * 0.5), atol=2)

    resp, data = _request(server, "POST", "/synthesize",
                          dict(base, volume=0.5, stream=True,
                               chunk_frames=8, overlap_frames=8))
    assert resp.status == 200
    pcm_stream = np.frombuffer(data, np.int16)
    assert len(pcm_stream) == len(pcm_half)
    np.testing.assert_allclose(pcm_stream, pcm_half, atol=2)


def test_concurrent_requests_batch(server):
    results = {}

    def worker(i):
        resp, data = _request(server, "POST", "/synthesize",
                              {"text": "[[abc def]]", "seed": 9})
        results[i] = (resp.status, data)

    before = dict(server.batcher.stats)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(status == 200 for status, _ in results.values())
    # identical params + seed -> identical audio regardless of batching
    blobs = {data for _, data in results.values()}
    assert len(blobs) == 1
    after = server.batcher.stats
    assert after["requests"] - before["requests"] == 6


def test_phonemize_route(server):
    resp, data = _request(server, "POST", "/phonemize",
                          {"text": "[[abc]]"})
    assert resp.status == 200
    payload = json.loads(data)
    assert payload["phonemes"]
    assert payload["ids"]


def test_bad_requests(server):
    resp, _ = _request(server, "POST", "/synthesize", {"nope": 1})
    assert resp.status == 400
    resp, _ = _request(server, "GET", "/nope")
    assert resp.status == 404
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("POST", "/synthesize", body=b"{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    resp.read()
    conn.close()
    assert resp.status == 400


def test_stream_engine_error_returns_json_500(server, voice,
                                              monkeypatch):
    """A streaming-engine failure must surface as a clean JSON 500:
    the pipeline runs up to the first chunk BEFORE headers go out, so a
    status line is never written into a chunked body."""
    def boom(*a, **k):
        raise NotImplementedError("no streaming on this engine")
        yield  # pragma: no cover — make it a generator

    monkeypatch.setattr(voice.engine, "synthesize_ids_streaming", boom)
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "abc def", "stream": True})
    assert resp.status == 500
    assert "error" in json.loads(data)


def test_phonemize_error_returns_json_500(server, voice, monkeypatch):
    monkeypatch.setattr(
        voice, "phonemize",
        lambda text: (_ for _ in ()).throw(RuntimeError("g2p down")))
    resp, data = _request(server, "POST", "/phonemize", {"text": "abc"})
    assert resp.status == 500
    assert "g2p down" in json.loads(data)["error"]


def test_multi_voice_server(voice):
    import jax as _jax

    from phoonnx_tpu.infer.engine import VitsEngine
    from phoonnx_tpu.voice import TTSVoice

    hp = VitsHParams.preset("micro", sample_rate=8000)
    params = vits_model.random_params(_jax.random.PRNGKey(7), hp)
    import dataclasses

    second = TTSVoice(
        engine=VitsEngine(params, hp),
        config=dataclasses.replace(voice.config, sample_rate=8000),
    )
    srv = TTSServer({"en": voice, "alt": second}, port=0,
                    max_batch=4, max_wait_ms=10.0)
    srv.start()
    try:
        resp, data = _request(srv, "GET", "/voices")
        assert resp.status == 200
        listing = json.loads(data)
        assert set(listing) == {"en", "alt"}
        assert listing["alt"]["sample_rate"] == 8000

        resp, data = _request(srv, "POST", "/synthesize",
                              {"text": "[[abc]]", "voice": "alt",
                               "seed": 1})
        assert resp.status == 200
        with wave.open(io.BytesIO(data), "rb") as w:
            assert w.getframerate() == 8000

        resp, data = _request(srv, "POST", "/synthesize",
                              {"text": "[[abc]]", "voice": "nope"})
        assert resp.status == 400
        assert "unknown voice" in json.loads(data)["error"]

        resp, data = _request(srv, "GET", "/stats")
        assert set(json.loads(data)) == {"en", "alt"}
    finally:
        srv.stop()


def test_batcher_coalesces_submissions(voice):
    """Deterministic batching check: stopped dispatcher, manual drain."""
    calls = []
    real = voice.engine.synthesize_batch

    def spy(batch_ids, **kw):
        calls.append(len(batch_ids))
        return real(batch_ids, **kw)

    batcher = DynamicBatcher(voice.engine, max_batch=8, max_wait_ms=1.0,
                             autostart=False)
    batcher.engine = type("E", (), {
        "synthesize_batch": staticmethod(spy), "hp": voice.engine.hp})()
    ids = [[1, 5, 9, 3]]
    scales = (0.667, 1.0, 0.8)
    subs = [batcher.submit(ids, scales) for _ in range(3)]
    batcher._drain_once()
    for sub in subs:
        audio = sub.wait(timeout=1.0)
        assert len(audio) > 0
    # ONE device batch; 3 real lanes padded up to the power-of-two batch
    # bucket (4) so distinct concurrency levels share compiled programs
    assert calls == [4]
    assert batcher.stats["max_batch_seen"] == 3


def test_oversized_sentence_returns_400_not_batched(server, voice):
    """A sentence above the largest text bucket must 400 its own request
    on the handler thread, never reach the dispatcher (where the error
    would poison co-batched requests)."""
    limit = voice.engine.text_buckets[-1]
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[" + "a " * (limit + 4) + "]]"})
    assert resp.status == 400
    assert "split the input text" in json.loads(data)["error"]


def test_float_seed_coerced(server):
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc]]", "seed": 5.0})
    assert resp.status == 200


def test_request_timeout_returns_clear_json_error(voice):
    """A too-small request_timeout must fail as a clean JSON error that
    points at warmup/cold compiles, not hang or corrupt HTTP framing."""
    srv = TTSServer(voice, port=0, max_batch=8, max_wait_ms=500.0,
                    request_timeout=1e-4)
    srv.start()
    try:
        resp, data = _request(srv, "POST", "/synthesize",
                              {"text": "[[abc]]"})
        assert resp.status == 504  # gateway-timeout, not a generic 500
        payload = json.loads(data)
        assert "timed out" in payload["error"]
        assert "--warmup" in payload["error"]
    finally:
        srv.stop()



def test_single_oversized_submission_chunks_to_max_batch(voice):
    """One request with more sentences than max_batch must dispatch in
    max_batch-lane chunks (found by review: the lane cap only applied
    across submissions, so one 100-sentence document compiled a fresh
    batch-128 program on the dispatcher)."""
    calls = []
    real = voice.engine.synthesize_batch

    def spy(batch_ids, **kw):
        calls.append(len(batch_ids))
        return real(batch_ids, **kw)

    batcher = DynamicBatcher(voice.engine, max_batch=8, max_wait_ms=1.0,
                             autostart=False)
    batcher.engine = type("E", (), {
        "synthesize_batch": staticmethod(spy), "hp": voice.engine.hp,
        "compiled_batching": True})()
    ids = [[1, 5, 9]] * 20
    sub = batcher.submit(ids, (0.667, 1.0, 0.8))
    batcher._drain_once()
    audio = sub.wait(timeout=30.0)
    assert len(audio) > 0
    assert calls == [8, 8, 4], calls  # 20 lanes -> 8+8+4(pow2 of 4)
    assert batcher.stats["max_batch_seen"] == 8


def test_batcher_length_sorted_bucket_chunks(voice):
    """A backlogged queue is over-drained past max_batch and lanes are
    LENGTH-SORTED before chunking (round 5): short sentences dispatch
    together so their chunk decodes at a tight bucket instead of bucket
    composition being FIFO-arrival luck — while every submission still
    receives exactly its own audio (permutation restored)."""
    calls = []
    up = voice.engine.hp.total_upsample

    def fake(batch_ids, **kw):
        calls.append([len(u) for u in batch_ids])
        bucket = max(len(u) for u in batch_ids)
        audio = np.zeros((len(batch_ids), bucket * up), np.float32)
        frames = []
        for i, u in enumerate(batch_ids):
            audio[i, :len(u) * up] = float(u[0])
            frames.append(len(u))
        return audio, frames

    batcher = DynamicBatcher(voice.engine, max_batch=4, max_wait_ms=1.0,
                             autostart=False)
    batcher.engine = type("E", (), {
        "synthesize_batch": staticmethod(fake), "hp": voice.engine.hp,
        "compiled_batching": True})()
    lens = [12, 3, 11, 2, 10, 4, 9, 5]  # interleaved long/short arrivals
    subs = [batcher.submit([[i + 1] * L], (0.667, 1.0, 0.8))
            for i, L in enumerate(lens)]
    batcher._drain_once()
    # the whole 8-lane backlog joined one group (over-drain), split into
    # two chunks with shorts and longs SEPARATED
    assert len(calls) == 2, calls
    assert max(calls[0]) <= min(calls[1]), calls
    # un-permutation: each submission gets its own (id-stamped) audio
    for i, (sub, length) in enumerate(zip(subs, lens)):
        audio = sub.wait(timeout=5.0)
        assert len(audio) == length * up
        assert audio[0] == i + 1
    assert batcher.stats["max_batch_seen"] == 4


def test_sequential_engine_gets_no_pad_rows(voice):
    """Engines that synthesize rows sequentially (compiled_batching
    False, e.g. the ONNX fallback) must not receive pad lanes — every
    pad row would be a REAL extra synthesis there."""
    calls = []
    real = voice.engine.synthesize_batch

    def spy(batch_ids, **kw):
        calls.append(len(batch_ids))
        return real(batch_ids, **kw)

    batcher = DynamicBatcher(voice.engine, max_batch=8, max_wait_ms=1.0,
                             autostart=False)
    batcher.engine = type("E", (), {
        "synthesize_batch": staticmethod(spy), "hp": voice.engine.hp,
        "compiled_batching": False})()
    subs = [batcher.submit([[1, 5, 9]], (0.667, 1.0, 0.8))
            for _ in range(3)]
    batcher._drain_once()
    for sub in subs:
        assert len(sub.wait(timeout=30.0)) > 0
    assert calls == [3], calls  # 3 lanes, NOT padded to 4


def test_submit_after_stop_fails_fast(voice):
    """A submission racing stop() must error immediately, not sleep out
    the full request timeout on an event nobody will set."""
    batcher = DynamicBatcher(voice.engine, autostart=False)
    batcher.stop()
    sub = batcher.submit([[1]], (0.667, 1.0, 0.8))
    with pytest.raises(RuntimeError, match="shutting down"):
        sub.wait(timeout=1.0)


def test_stop_before_start_returns_promptly(voice):
    """socketserver.shutdown() blocks forever on a server whose
    serve_forever never ran; stop() must handle the never-started case
    (e.g. cleanup after a warmup failure)."""
    import time as _time

    srv = TTSServer(voice, port=0, max_batch=4)
    t0 = _time.monotonic()
    srv.stop()
    assert _time.monotonic() - t0 < 3.0


def test_nan_scales_return_400(server):
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc]]", "noise_scale": float("nan")})
    assert resp.status == 400
    assert "finite" in json.loads(data)["error"]
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc]]", "length_scale": 0.0})
    assert resp.status == 400


def test_stream_with_normalize_returns_400(server):
    """normalize cannot be honored chunk-by-chunk; silently ignoring it
    would make the WAV and stream routes disagree on loudness for the
    same request — must refuse loudly."""
    resp, data = _request(server, "POST", "/synthesize",
                          {"text": "[[abc]]", "stream": True,
                           "normalize": True})
    assert resp.status == 400
    assert "normalize" in json.loads(data)["error"]


# -- multi-device serving (engine replication across the CPU mesh) ---------

@pytest.fixture(scope="module")
def pool_server(voice):
    srv = TTSServer(voice, port=0, max_batch=8, max_wait_ms=30.0,
                    devices=2)
    srv.start()
    yield srv
    srv.stop()


def test_pool_engines_on_distinct_devices(pool_server):
    from phoonnx_tpu.serve import BatcherPool

    batcher = pool_server.batcher
    assert isinstance(batcher, BatcherPool)
    devs = [b.engine.device for b in batcher.batchers]
    assert len(devs) == 2 and devs[0] != devs[1]
    for b in batcher.batchers:
        leaf = jax.tree.leaves(b.engine.params)[0]
        assert list(leaf.devices()) == [b.engine.device]


def test_pool_synthesis_and_stats(pool_server):
    # seeded requests are deterministic and engines share weights, so
    # the same request must produce identical audio whichever chip
    # serves it
    wavs = []
    for _ in range(4):
        resp, data = _request(pool_server, "POST", "/synthesize",
                              {"text": "abcabc", "seed": 5})
        assert resp.status == 200
        wavs.append(data)
    assert all(w == wavs[0] for w in wavs[1:])
    resp, data = _request(pool_server, "GET", "/stats")
    stats = json.loads(data)
    assert stats["devices"] == 2
    assert stats["requests"] >= 4
    assert len(stats["per_device"]) == 2


def test_pool_concurrent_requests_spread(pool_server):
    results = [None] * 6
    def hit(i):
        resp, data = _request(pool_server, "POST", "/synthesize",
                              {"text": "abcdef"})
        results[i] = resp.status
    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads: t.start()
    for t in threads: t.join()
    assert all(s == 200 for s in results)
    stats = pool_server.batcher.stats
    assert stats["requests"] >= 6


def test_pool_streaming_round_robin(pool_server):
    from phoonnx_tpu.serve import BatcherPool

    batcher = pool_server.batcher
    assert isinstance(batcher, BatcherPool)
    e1, e2 = batcher.next_engine(), batcher.next_engine()
    assert e1 is not e2
    resp, data = _request(pool_server, "POST", "/synthesize",
                          {"text": "abc", "stream": True, "seed": 1})
    assert resp.status == 200
    assert len(data) > 0 and len(data) % 2 == 0  # s16le


def test_engine_replicate_reuses_primary(voice):
    devs = jax.local_devices()[:2]
    engines = voice.engine.replicate(devs)
    assert engines[0] is voice.engine
    assert engines[1] is not voice.engine
    ids = [5, 6, 7, 8, 9, 4]
    a = engines[0].synthesize_ids(ids, seed=3)
    b = engines[1].synthesize_ids(ids, seed=3)
    np.testing.assert_array_equal(a, b)


def test_device_memory_stats_shape():
    """device_memory_stats returns MB-scaled dicts (may be empty on
    backends without allocator stats — the CPU test backend usually
    reports them)."""
    from phoonnx_tpu.observability import device_memory_stats

    stats = device_memory_stats()
    for dev_id, entry in stats.items():
        assert set(entry) == {"bytes_in_use_mb", "peak_bytes_in_use_mb",
                              "bytes_limit_mb"}
        assert all(v >= 0 for v in entry.values())
