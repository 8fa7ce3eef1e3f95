"""Tests for TPU ops: MAS dynamic program and STFT/mel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoonnx_tpu.ops.mas import maximum_path, maximum_path_numpy
from phoonnx_tpu.ops.stft import hann_window, mel_filterbank, spectrogram

torch = pytest.importorskip("torch")


def _brute_force_best(neg_cent):
    """Enumerate all monotonic paths (tiny sizes) for the optimum score."""
    t_y, t_x = neg_cent.shape
    best = [-np.inf, None]

    def rec(y, x, score, assignment):
        score = score + neg_cent[y, x]
        assignment = assignment + [x]
        if y == t_y - 1:
            if x == t_x - 1 and score > best[0]:
                best[0], best[1] = score, assignment
            return
        rec(y + 1, x, score, assignment)
        if x + 1 < t_x:
            rec(y + 1, x + 1, score, assignment)

    rec(0, 0, 0.0, [])
    return best


def test_mas_matches_bruteforce_score():
    rng = np.random.default_rng(0)
    for _ in range(5):
        t_y, t_x = 7, 4
        neg_cent = rng.standard_normal((1, t_y, t_x)).astype(np.float32)
        mask = np.ones_like(neg_cent)
        path = maximum_path_numpy(neg_cent, mask)[0]
        score_np = float((path * neg_cent[0]).sum())
        best_score, _ = _brute_force_best(neg_cent[0])
        assert abs(score_np - best_score) < 1e-4
        # exactly one text position per frame, monotonic
        assert (path.sum(1) == 1).all()
        positions = path.argmax(1)
        assert (np.diff(positions) >= 0).all()


def test_mas_scan_matches_numpy():
    rng = np.random.default_rng(1)
    b, t_y, t_x = 3, 20, 8
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    y_lens = np.array([20, 15, 9])
    x_lens = np.array([8, 5, 3])
    mask = np.zeros((b, t_y, t_x), np.float32)
    for i in range(b):
        mask[i, :y_lens[i], :x_lens[i]] = 1

    want = maximum_path_numpy(neg_cent, mask)
    got = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_mas_scan_large_random():
    rng = np.random.default_rng(2)
    b, t_y, t_x = 2, 96, 31
    neg_cent = (rng.standard_normal((b, t_y, t_x)) * 4).astype(np.float32)
    mask = np.ones((b, t_y, t_x), np.float32)
    want = maximum_path_numpy(neg_cent, mask)
    got = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_hann_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_spectrogram_matches_reference_recipe():
    """Compare with the exact torch.stft recipe from mel_processing.py:40-76."""
    rng = np.random.default_rng(3)
    n_fft, hop, win = 256, 64, 256
    y = (rng.standard_normal((2, 2048)) * 0.2).astype(np.float32)

    ours = np.asarray(spectrogram(jnp.asarray(y), n_fft, hop, win))

    yt = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(
        yt.unsqueeze(1), (pad, pad), mode="reflect"
    ).squeeze(1)
    spec = torch.view_as_real(
        torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                   window=torch.hann_window(win), center=False,
                   pad_mode="reflect", normalized=False, onesided=True,
                   return_complex=True)
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # [B, F, T]
    np.testing.assert_allclose(ours, spec.transpose(0, 2, 1), atol=2e-4)


def test_mel_filterbank_properties():
    basis = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert basis.shape == (80, 513)
    assert (basis >= 0).all()
    # every mel band has some support
    assert (basis.sum(axis=1) > 0).all()
    # slaney normalisation keeps peaks well below 1
    assert basis.max() < 0.1


def test_mas_pallas_interpret_matches_oracle():
    from phoonnx_tpu.ops.mas_pallas import maximum_path_pallas

    rng = np.random.default_rng(4)
    b, t_y, t_x = 3, 48, 16
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    mask = np.zeros((b, t_y, t_x), np.float32)
    for i, (y, x) in enumerate([(48, 16), (40, 9), (21, 5)]):
        mask[i, :y, :x] = 1
    want = maximum_path_numpy(neg_cent, mask)
    got = np.asarray(maximum_path_pallas(
        jnp.asarray(neg_cent), jnp.asarray(mask), interpret=True
    ))
    np.testing.assert_array_equal(got, want)


def test_mas_pallas_sharded_batch_mesh():
    """The Pallas MAS partitions over a batch-sharded data mesh: each
    device runs the kernel on its local shard (custom_partitioning), no
    all-gather of the score planes, output bit-identical to the scan DP."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from phoonnx_tpu.ops.mas import maximum_path
    from phoonnx_tpu.ops.mas_pallas import maximum_path_pallas
    from phoonnx_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    b, t_y, t_x = 16, 48, 16
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    mask = np.zeros((b, t_y, t_x), np.float32)
    y_lens = rng.integers(t_y // 2, t_y + 1, size=b)
    x_lens = rng.integers(t_x // 2, t_x + 1, size=b)
    for i in range(b):
        mask[i, : y_lens[i], : x_lens[i]] = 1

    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    sharding = NamedSharding(mesh, P("data"))
    neg_s = jax.device_put(jnp.asarray(neg_cent), sharding)
    mask_s = jax.device_put(jnp.asarray(mask), sharding)

    fn = jax.jit(lambda n, m: maximum_path_pallas(n, m, interpret=True))
    out = fn(neg_s, mask_s)
    assert out.sharding.spec[0] == "data"
    hlo = fn.lower(neg_s, mask_s).compile().as_text()
    assert "all-gather" not in hlo

    want = np.asarray(maximum_path(
        jnp.asarray(neg_cent), jnp.asarray(mask), impl="scan"))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_mas_pallas_mixed_shardings_compile():
    """One operand batch-sharded, the other replicated: the partition
    rule must settle on ONE common batch sharding for both operands and
    the result (regression: per-operand projection handed lower_fn
    differently-sized local shards and failed compilation)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from phoonnx_tpu.ops.mas import maximum_path
    from phoonnx_tpu.ops.mas_pallas import maximum_path_pallas
    from phoonnx_tpu.parallel import make_mesh

    rng = np.random.default_rng(12)
    b, t_y, t_x = 8, 32, 12
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    mask = np.ones((b, t_y, t_x), np.float32)

    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    neg_s = jax.device_put(jnp.asarray(neg_cent),
                           NamedSharding(mesh, P("data")))
    mask_r = jax.device_put(jnp.asarray(mask),
                            NamedSharding(mesh, P()))  # replicated

    fn = jax.jit(lambda n, m: maximum_path_pallas(n, m, interpret=True))
    out = np.asarray(fn(neg_s, mask_r))
    want = np.asarray(maximum_path(
        jnp.asarray(neg_cent), jnp.asarray(mask), impl="scan"))
    np.testing.assert_array_equal(out, want)


def test_mas_impl_dispatch():
    """maximum_path(impl=...) routes to identical implementations."""
    from phoonnx_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(9)
    b, t_y, t_x = 2, 32, 12
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    mask = np.zeros((b, t_y, t_x), np.float32)
    mask[0, :32, :12] = 1
    mask[1, :20, :7] = 1
    want = maximum_path_numpy(neg_cent, mask)
    for impl in ("scan", "pallas", "auto"):
        got = np.asarray(maximum_path(
            jnp.asarray(neg_cent), jnp.asarray(mask), impl=impl))
        np.testing.assert_array_equal(got, want, err_msg=impl)
    with pytest.raises(ValueError):
        maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask), impl="nope")


@pytest.mark.parametrize("n_bands", [2, 4, 8])
def test_pqmf_near_perfect_reconstruction(n_bands):
    """analysis -> synthesis reconstructs (delay taps//2, err ~ -45 dB)."""
    from phoonnx_tpu.ops.pqmf import (
        pqmf_analysis,
        pqmf_filters,
        pqmf_synthesis,
    )

    ana, syn = pqmf_filters(n_bands)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32) * 0.3
    sub = pqmf_analysis(jnp.asarray(x)[None], ana, n_bands)
    assert sub.shape == (1, 4096 // n_bands, n_bands)
    y = np.asarray(pqmf_synthesis(sub, syn, n_bands))[0]
    assert y.shape == x.shape
    d = 31  # taps // 2 group delay
    err = np.abs(y[d:3500 + d] - x[:3500])
    assert err.max() < 0.01, err.max()


def test_istft_roundtrip_with_stft():
    """spectrogram -> istft reconstructs the waveform (center region)."""
    from phoonnx_tpu.ops.istft import istft
    from phoonnx_tpu.ops.stft import spectrogram

    rng = np.random.default_rng(5)
    n_fft, hop, win = 32, 8, 32
    y = (rng.standard_normal((1, 512)) * 0.3).astype(np.float32)
    # use a full complex STFT for the round trip (our spectrogram returns
    # magnitude; rebuild phase from the same framing)
    pad = (n_fft - hop) // 2
    yp = np.pad(y, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (yp.shape[1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = yp[:, idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames, axis=-1)
    out = np.asarray(istft(
        jnp.asarray(np.abs(spec).astype(np.float32)),
        jnp.asarray(np.angle(spec).astype(np.float32)),
        n_fft, hop, win,
    ))
    # istft crops n_fft//2 (center=True) while our framing padded
    # (n_fft-hop)//2 -> a constant offset of hop//2 samples
    shift = n_fft // 2 - (n_fft - hop) // 2
    n = min(out.shape[1], y.shape[1]) - n_fft
    core = np.arange(n_fft, n)
    np.testing.assert_allclose(
        out[0, core], y[0, core + shift], atol=1e-3
    )


def test_observability_stats():
    from phoonnx_tpu.observability import SynthesisStats

    stats = SynthesisStats()
    for latency in (0.1, 0.2, 0.3):
        stats.record(latency, 5.0)
    summary = stats.summary()
    assert summary["count"] == 3
    assert abs(summary["rtf"] - 0.6 / 15.0) < 1e-6
    assert summary["p50_latency_ms"] == 200.0
    assert summary["total_audio_s"] == 15.0


def test_generate_path_exact_in_bfloat16():
    """Frame counting must stay exact for bf16 engines: durations whose
    cumsum exceeds 256 quantize in bfloat16 (spacing 2), which used to
    drop/duplicate frames in the alignment path."""
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import nn

    rng = np.random.default_rng(0)
    durations = rng.integers(1, 9, (2, 80)).astype(np.float32)  # sums ~320
    t_y = int(durations.sum(axis=1).max())
    mask_bf16 = jnp.ones((2, t_y, 80), jnp.bfloat16)
    path = np.asarray(
        nn.generate_path(jnp.asarray(durations, jnp.bfloat16), mask_bf16)
    ).astype(np.float32)
    # every frame within each row's true length maps to exactly one token
    for b in range(2):
        n = int(durations[b].sum())
        assert path[b, :n].sum(axis=-1).tolist() == [1.0] * n
        # and each token gets exactly its duration in frames
        np.testing.assert_array_equal(path[b].sum(axis=0),
                                      durations[b])


def test_mas_exact_lengths_with_bf16_mask():
    """attn_mask arrives in bf16 under mixed precision; length counting
    must stay exact past 256 frames (bf16 sums quantize: 257 ones -> 256),
    or MAS aligns/backtracks from the wrong frame."""
    import jax.numpy as jnp

    from phoonnx_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(0)
    t_y, t_x = 300, 24  # > 256 frames
    neg_cent = rng.standard_normal((1, t_y, t_x)).astype(np.float32)
    mask_f32 = np.ones((1, t_y, t_x), np.float32)
    path_f32 = np.asarray(maximum_path(jnp.asarray(neg_cent),
                                       jnp.asarray(mask_f32)))
    path_bf16 = np.asarray(maximum_path(
        jnp.asarray(neg_cent, jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(mask_f32, jnp.bfloat16),
    ))
    # full-length alignment: every one of the 300 frames gets a token
    assert path_bf16.sum() == t_y
    np.testing.assert_array_equal(path_bf16, path_f32)


def test_expand_prior_bit_equals_onehot_einsum():
    """The gather-based prior expansion (model.expand_prior) must match
    einsum(generate_path one-hot, m_p) BIT-FOR-BIT on the valid span —
    including zero-duration positions, padded text tails and frame
    buckets longer than the true length (the hot inference path uses
    the gather; generate_path stays for callers that want the matrix)."""
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import nn
    from phoonnx_tpu.models.vits import model as vits_model

    rng = np.random.default_rng(7)
    B, TX, TY, C = 4, 19, 48, 6
    for trial in range(20):
        dur = rng.integers(0, 4, (B, TX)).astype(np.float32)
        xlen = rng.integers(1, TX + 1, B)
        for b in range(B):
            dur[b, xlen[b]:] = 0
            if dur[b, :xlen[b]].sum() == 0:
                dur[b, 0] = 1
        w_ceil = jnp.asarray(dur)
        m_p = jnp.asarray(
            rng.standard_normal((B, TX, C)).astype(np.float32))
        logs_p = jnp.asarray(
            rng.standard_normal((B, TX, C)).astype(np.float32))
        x_mask = (np.arange(TX)[None, :] < xlen[:, None]
                  ).astype(np.float32)[..., None]
        ylen = np.minimum(np.maximum(dur.sum(-1), 1), TY).astype(np.int32)
        y_mask = (np.arange(TY)[None, :] < ylen[:, None]
                  ).astype(np.float32)[..., None]
        attn_mask = jnp.asarray(y_mask) * jnp.swapaxes(
            jnp.asarray(x_mask), 1, 2)
        attn = nn.generate_path(w_ceil, attn_mask)
        m_ref = jnp.einsum("byx,bxc->byc", attn, m_p)
        l_ref = jnp.einsum("byx,bxc->byc", attn, logs_p)
        m_new, l_new = vits_model.expand_prior(
            m_p, logs_p, w_ceil, jnp.asarray(y_mask), TY)
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_new))
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_new))
