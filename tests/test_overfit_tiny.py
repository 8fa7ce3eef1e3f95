"""The trainer LEARNS (VERDICT r4 #2): overfit a tiny learnable corpus.

Every other training test asserts finiteness, one-step parity, or
mechanics; a GAN loop can pass all of those and still diverge. This
test runs the real fused G+D step a few hundred steps on two
deterministic, learnable utterances (each phoneme id maps to a fixed
tone; spec computed from the audio by the training STFT) and asserts
the reference's convergence behavior (the purpose of phoonnx_train:
reference phoonnx_train/vits/lightning.py:196-280):

* mel L1 falls to a fraction of its start,
* the total generator objective falls by an order of magnitude,
* the duration loss improves,
* the discriminator neither collapses to zero nor explodes.

Margins are ~2x looser than a measured CPU run (mel 101.5 -> 33.8,
gen_all 1082 -> 74, dur 2.35 -> 1.50, disc in [0.14, 2.44] over the
last 50 of 300 steps at lr 2e-4) so scheduler-level numeric drift
cannot flake the test while a non-learning loop still fails it.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.ops import stft
from phoonnx_tpu.train.step import TrainConfig, init_train_state, train_step

HP = VitsHParams(
    n_vocab=40,
    spec_channels=65,
    segment_size=16,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=1,
    resblock="2",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8),
    filter_length=128,
    hop_length=16,
    win_length=128,
    mel_channels=20,
    sample_rate=16000,
)

STEPS = 250


def make_learnable_batch(batch=2, t_x=12, t_y=48):
    """Deterministic, LEARNABLE utterances: each phoneme id maps to a
    fixed two-harmonic tone; audio is the concatenation of per-phoneme
    tones, spec is the training STFT of that audio (so the posterior
    target is consistent with the waveform target)."""
    rng = np.random.default_rng(3)
    hop = HP.hop_length
    n = t_y * hop
    ids = rng.integers(1, HP.n_vocab, (batch, t_x))
    audio = np.zeros((batch, n), np.float32)
    frames_per_ph = t_y // t_x
    t = np.arange(n) / HP.sample_rate
    for b in range(batch):
        for k, pid in enumerate(ids[b]):
            s = k * frames_per_ph * hop
            e = min(n, (k + 1) * frames_per_ph * hop)
            f0 = 100.0 + 40.0 * pid
            seg_t = t[s:e]
            audio[b, s:e] = 0.35 * np.sin(2 * np.pi * f0 * seg_t) \
                + 0.15 * np.sin(2 * np.pi * 2 * f0 * seg_t)
    spec = np.asarray(stft.spectrogram(
        jnp.asarray(audio), HP.filter_length, hop, HP.win_length))
    return {
        "phoneme_ids": jnp.asarray(ids, jnp.int32),
        "phoneme_lengths": jnp.full((batch,), t_x, jnp.int32),
        "spec": jnp.asarray(spec[:, :t_y]),
        "spec_lengths": jnp.full((batch,), min(t_y, spec.shape[1]),
                                 jnp.int32),
        "audio": jnp.asarray(audio),
    }


@pytest.mark.slow
def test_overfit_tiny():
    cfg = TrainConfig(learning_rate=2e-4, steps_per_epoch=10 ** 6,
                      disc_periods=(2, 3), disc_channel_scale=4)
    state = init_train_state(jax.random.PRNGKey(0), HP, cfg)
    batch = make_learnable_batch()
    step = jax.jit(partial(train_step, hp=HP, cfg=cfg))

    mel, gen, dur, disc = [], [], [], []
    for i in range(STEPS):
        state, m = step(state, batch,
                        jax.random.fold_in(jax.random.PRNGKey(7), i))
        mel.append(float(m["loss_mel"]))
        gen.append(float(m["loss_gen_all"]))
        dur.append(float(m["loss_dur"]))
        disc.append(float(m["loss_disc_all"]))

    for name, series in (("mel", mel), ("gen", gen), ("dur", dur),
                         ("disc", disc)):
        assert all(np.isfinite(series)), f"{name} went non-finite"

    mel_first, mel_last = np.mean(mel[:20]), np.mean(mel[-20:])
    gen_first, gen_last = np.mean(gen[:20]), np.mean(gen[-20:])
    dur_first, dur_last = np.mean(dur[:20]), np.mean(dur[-20:])

    # learning, with ~2x margin over the measured trajectory
    assert mel_last < 0.65 * mel_first, (mel_first, mel_last)
    assert gen_last < 0.30 * gen_first, (gen_first, gen_last)
    assert dur_last < 0.95 * dur_first, (dur_first, dur_last)
    # discriminator stays in a healthy band (no collapse, no explosion)
    tail = disc[-50:]
    assert 1e-3 < min(tail), tail[:5]
    assert max(tail) < 20.0, max(tail)
