"""Benchmark: VITS synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Measures the full synthesis graph (text encoder + SDP + alignment +
inverse flow + HiFi-GAN) on the "medium" voice preset at a realistic
workload: one ~6s utterance per program (frame bucket 512 @ 86.1 fps,
22.05 kHz). RTF = device_time / audio_seconds_decoded. The reference
publishes no numbers (BASELINE.md); vs_baseline compares against the
north-star target RTF 0.02 (>1.0 means better than target).

Beyond the headline, the extras carry the BASELINE.json config matrix:
a batch sweep to the throughput ceiling (config 5), the high preset,
multi-speaker synthesis with per-call speaker ids (config 2), the
non-IPA Hangul front-end and a diacritizer-shaped aux model (config 3),
and the ByT5 G2P batch decode (config 4).

CONTENTION POLICY (VERDICT r4 #1): the bench chip is shared, and a
degraded window can misstate device time by an order of magnitude
(round 4 captured its artifact at 6.1 TFLOP/s calibrated — 2.7% of the
225 TFLOP/s reference state — making every headline a raw number x37).
This bench therefore:

* calibrates FIRST and, while the calibrated matmul peak is below
  ``CAL_OK_FRAC`` of the reference state, sleeps and retries within a
  bounded wait budget before starting the headline sections;
* stamps every major section with a quick calibration
  (``extra["cal_stamps"]``) so per-section chip state is auditable;
* re-measures the headline at the end and keeps the better window;
* marks the artifact ``chip_state: "ok" | "degraded"``. Degraded
  artifacts still carry raw + normalized numbers, but the flag says
  the raw numbers are NOT steady-state and the normalization is doing
  real work — do not use them for round-over-round perf claims.

FLOPs/MFU are ANALYTIC (phoonnx_tpu.flops, closed-form from
VitsHParams): XLA's cost_analysis() attributes ~zero FLOPs to the
Pallas custom-calls holding most of the decoder compute and overcounts
input-dilated transposed convs, so it undercounted the model by ~100x
(VERDICT r2). Model FLOPs are the math the graph must do — the packed
TPU kernels deliberately do more arithmetic to fill lanes, so MFU here
is conservative.

Timing methodology: N synthesis steps are CHAINED inside one jitted
program (per-step rng via fold_in, a scalar checksum threads the data
dependency), and the wall clock runs until the checksum's *bytes* are
fetched. This is robust on remote-tunnel TPU backends where
``block_until_ready`` can return before device execution finishes
(observed on the axon relay: 30 dispatched programs "completed" in less
time than one program's FLOPs allow). The trivial-program round-trip
time is measured separately and subtracted.

Sections after the headline honor a soft wall-clock budget
(BENCH_BUDGET_S, default 1500 s): when cold compiles over the tunnel
run long (2-9 min each under chip contention), later sections emit
null instead of stalling the driver.
"""

import json
import os
import sys
import time
from functools import partial

TARGET_RTF = 0.02
N_CHAIN = 20
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
# Reference chip state for cross-round comparability: the matmul
# calibration measured ~225 f32 TFLOP/s on this chip in a quiet round-1
# session. Normalized metrics scale measured times by
# (calibrated_peak / REF_PEAK) so rounds taken under different shared-
# chip contention states compare apples to apples (VERDICT r3 #2).
REF_PEAK_F32 = 225e12
# A window whose calibrated peak is below this fraction of the
# reference state is DEGRADED: headline sections wait for a better
# window (bounded budget below) rather than publish from it.
CAL_OK_FRAC = 0.4
# Total seconds the window gate may spend sleeping/retrying before
# giving up and stamping the artifact degraded.
_WINDOW_WAIT_S = float(os.environ.get(
    "BENCH_WINDOW_WAIT_S", str(min(600.0, 0.4 * _BUDGET_S))))


def _over_budget() -> bool:
    return time.monotonic() - _T0 > _BUDGET_S


def _fetch(x):
    """Barrier that provably waits: pull the result's bytes to host."""
    import numpy as np

    return np.asarray(x)


def _measure_rtt() -> float:
    """Median dispatch+fetch round-trip of a trivial program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def triv(x):
        return x + 1.0

    _fetch(triv(jnp.float32(0.0)))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        _fetch(triv(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu import flops as flops_mod
    from phoonnx_tpu.models.vits import model as vits_model
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    params = jax.device_put(params)

    t_text, max_frames = 128, 512
    # what the engine dispatches in production: decoder packed kernels
    # precomputed at init (placement-only, bit-identical; engine.py
    # _params_for_frames)
    packed = vits_model.pack_decoder_params(params, hp, max_frames)
    sample_rate = hp.sample_rate
    audio_seconds = max_frames * hp.hop_length / sample_rate
    gflops_utt = flops_mod.infer_gflops(hp, t_text, max_frames)

    def forward(params, ids, lengths, rng):
        audio, y_lengths, _ = vits_model.infer(
            params, hp, ids, lengths, max_frames=max_frames,
            noise_scale=jnp.float32(0.667),
            length_scale=jnp.float32(1.0),
            noise_w=jnp.float32(0.8),
            rng=rng,
        )
        return audio, y_lengths

    ids = jnp.asarray(
        np.random.default_rng(0).integers(4, 160, (1, t_text)), jnp.int32
    )
    lengths = jnp.asarray([t_text], jnp.int32)

    rtt = _measure_rtt()

    # Matmul-calibrated chip peak (the practically achievable ceiling on
    # this chip/stack; ~225 f32 TFLOP/s on v5e in a quiet window).
    n_cal = 4096
    a_cal = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_cal, n_cal)),
        jnp.float32)

    @jax.jit
    def cal_chain(a):
        def body(i, acc):
            m = acc @ a
            return m / (jnp.abs(m).max() + 1.0)

        return jax.lax.fori_loop(0, 24, body, a)[0, 0]

    def calibrate(reps: int = 3):
        # vary the operand per rep: identical (executable, value) pairs
        # can be served from a relay cache on this backend (the same
        # trap the synthesis chains avoid via fold_in)
        _fetch(cal_chain(a_cal))
        cal_best = float("inf")
        for rep in range(reps):
            arg = a_cal + jnp.float32((rep + 1) * 1e-6)
            _fetch(arg)
            t0 = time.perf_counter()
            _fetch(cal_chain(arg))
            cal_best = min(cal_best, time.perf_counter() - t0)
        return 24 * 2 * n_cal ** 3 / max(cal_best - rtt, 1e-9)

    # -- window gate (VERDICT r4 #1): never START the headline in a
    # degraded window when waiting can find a better one -----------------
    cal_stamps = {}
    window_attempts = []
    t_gate = time.monotonic()
    peak_flops = calibrate()
    window_attempts.append(round(peak_flops / 1e12, 1))
    while (peak_flops < CAL_OK_FRAC * REF_PEAK_F32
           and time.monotonic() - t_gate < _WINDOW_WAIT_S):
        time.sleep(45.0)
        peak_flops = calibrate()
        window_attempts.append(round(peak_flops / 1e12, 1))
    chip_state = ("ok" if peak_flops >= CAL_OK_FRAC * REF_PEAK_F32
                  else "degraded")
    cal_stamps["headline_pre"] = round(peak_flops / 1e12, 1)

    def stamp(section: str) -> None:
        """Quick per-section calibration stamp for auditability."""
        cal_stamps[section] = round(calibrate(reps=2) / 1e12, 1)

    def chained_seconds(run_params, ids_c, lengths_c, n_chain=N_CHAIN,
                        reps=3, key_base=0):
        """Best-of-reps device seconds per synthesis step
        (RTT-corrected; best-of because the bench chip is shared and
        transient contention otherwise dominates — observed 3x swings).
        ``key_base`` keeps repeat measurements of the same compiled
        chain on FRESH rng keys — the relay can serve an identical
        (executable, arguments) pair from cache."""

        @jax.jit
        def chain(params, ids, lengths, base_rng):
            def body(i, acc):
                rng = jax.random.fold_in(base_rng, i)
                audio, _ = forward(params, ids, lengths, rng)
                # checksum threads the dependency so no step can be
                # elided or overlapped out of the measurement
                return acc + audio[:, :: 1997].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

        _fetch(chain(run_params, ids_c, lengths_c,
                     jax.random.PRNGKey(key_base)))
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            _fetch(chain(run_params, ids_c, lengths_c,
                         jax.random.PRNGKey(key_base + rep + 1)))
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 1e-9) / n_chain

    # Headline: single-utterance fp32 RTF (device compute per audio
    # second). Measured twice — here and again at the end of the run —
    # keeping the best: the shared bench chip has multi-minute
    # contention spikes, and a single early window can misstate
    # steady-state device time by 2x.
    step_s = chained_seconds(packed, ids, lengths, reps=5)
    rtf = step_s / audio_seconds
    # Single-stream synthesis is latency- and bandwidth-bound (tiny
    # tensors), so MFU here is honest context for RTF, not a target.
    mfu_single = gflops_utt * 1e9 / step_s / peak_flops

    # Config 5: batched throughput sweep to the ceiling, fp32 and bf16.
    stamp("batch_sweep")
    bf16_packed = None

    def throughput(batch: int, dtype):
        nonlocal bf16_packed
        run_params = packed
        if dtype == jnp.bfloat16:
            if bf16_packed is None:
                from phoonnx_tpu.infer.engine import cast_floating

                bf16_packed = vits_model.pack_decoder_params(
                    cast_floating(params, jnp.bfloat16), hp, max_frames)
            run_params = bf16_packed
        ids_b = jnp.tile(ids, (batch, 1))
        lengths_b = jnp.full((batch,), t_text, jnp.int32)
        n_chain = 20 if batch <= 16 else (8 if batch <= 64 else 4)
        per_step = chained_seconds(run_params, ids_b, lengths_b,
                                   n_chain=n_chain, reps=2)
        audio_per_sec = batch * audio_seconds / per_step
        mfu = batch * gflops_utt * 1e9 / per_step / peak_flops
        return audio_per_sec, mfu

    sweep = {"fp32": {}, "bf16": {}}
    peak_tp, peak_mfu, peak_cfg, peak_dtype = 0.0, 0.0, None, None
    b1_by_dtype = {}
    # batch 1 rides in each sweep so the peak/single-stream ratio has a
    # same-session, same-methodology (chained, reps=2), SAME-DTYPE
    # denominator (ADVICE r4: a cross-dtype ratio — bf16 peak over fp32
    # b1 — mis-states the pure batching gain)
    for dtype_name, dtype, batches in (
            ("fp32", jnp.float32, (1, 4, 16, 64, 128, 256)),
            ("bf16", jnp.bfloat16, (1, 16, 64, 128, 256))):
        prev = 0.0
        small_gains = 0
        for batch in batches:
            if _over_budget():
                break
            tp, mfu = throughput(batch, dtype)
            sweep[dtype_name][str(batch)] = {
                "audio_sec_per_sec": round(tp, 1),
                "mfu": round(mfu, 4),
            }
            if batch == 1:
                b1_by_dtype[dtype_name] = tp
            if tp > peak_tp and batch > 1:  # peak_* means peak BATCHED
                peak_tp, peak_mfu = tp, mfu
                peak_cfg, peak_dtype = f"{dtype_name}/b{batch}", dtype_name
            # saturation stop: only after TWO consecutive <5% gains, and
            # never on a single decline (a decline can be contention
            # noise — VERDICT r3's sweep stopped at b64 on one)
            small_gains = small_gains + 1 if tp < prev * 1.05 else 0
            if small_gains >= 2:
                break
            prev = tp
    stamp("batch_sweep_post")

    batch16_fp32 = (sweep["fp32"].get("16") or {}).get("audio_sec_per_sec")
    batch16_bf16 = (sweep["bf16"].get("16") or {}).get("audio_sec_per_sec")
    # same-session batching gain: sweep peak over the SAME DTYPE's sweep
    # b1 (identical chained methodology, chip window, and numerics)
    b1_same = b1_by_dtype.get(peak_dtype)
    batch_gain_same_session = (
        None if not b1_same or not peak_tp else peak_tp / b1_same)

    # Mixed-length batch: realistic per-element text lengths (the
    # identical-length sweep above is the best case for lane packing;
    # this measures the padded-bucket cost a production batcher pays,
    # with throughput credited only for each element's TRUE audio).
    # >=5 reps (VERDICT r4: the r4 pair was reps=2 on a degraded chip
    # and its bucketed<padded ordering was likely noise).
    mixed_tp = None
    rng_mix = np.random.default_rng(7)
    mix_batch = 16
    mix_lengths = rng_mix.integers(32, t_text + 1, mix_batch)
    ids_mix_np = rng_mix.integers(4, 160, (mix_batch, t_text))
    ids_mix_np[np.arange(t_text)[None, :] >= mix_lengths[:, None]] = 0
    if not _over_budget():
        stamp("mixed_length")
        ids_mix = jnp.asarray(ids_mix_np, jnp.int32)
        lengths_mix = jnp.asarray(mix_lengths, jnp.int32)

        @jax.jit
        def chain_mix(params, ids_c, lengths_c, base_rng):
            def body(i, carry):
                acc, secs = carry
                rng = jax.random.fold_in(base_rng, i)
                audio, y_lengths = forward(params, ids_c, lengths_c, rng)
                acc = acc + audio[:, ::1997].astype(jnp.float32).sum()
                secs = secs + y_lengths.astype(jnp.float32).sum()
                return acc, secs

            return jax.lax.fori_loop(
                0, 8, body, (jnp.float32(0.0), jnp.float32(0.0)))

        _fetch(chain_mix(packed, ids_mix, lengths_mix,
                         jax.random.PRNGKey(0))[0])
        best_mix, frames_sum = float("inf"), None
        for rep in range(5):
            t0 = time.perf_counter()
            _acc, fsum = chain_mix(packed, ids_mix, lengths_mix,
                                   jax.random.PRNGKey(rep + 1))
            _fetch(_acc)
            best_mix = min(best_mix, time.perf_counter() - t0)
            frames_sum = float(_fetch(fsum))
        audio_s_per_call = frames_sum / 8 * hp.hop_length / sample_rate
        mixed_tp = audio_s_per_call / (max(best_mix - rtt, 1e-9) / 8)

    # Mixed-length through the REAL serving path (VERDICT r4 #1): the
    # same 16-utterance draw submitted to serve.py's DynamicBatcher,
    # which drains the backlog, length-sorts lanes, and chunks them at
    # max_batch so short sentences dispatch at smaller text/frame
    # buckets. Two arms, identical requests + batcher, differing ONLY
    # in the engine's bucket ladder:
    #   padded   — one bucket (128 text / 512 frames): every chunk pays
    #              the global max, the r4 "padded" baseline;
    #   bucketed — graduated ladder: the batcher's sorted chunks decode
    #              at their own tightest bucket.
    # Wall-clock includes per-dispatch tunnel RTT for both arms alike;
    # throughput credits each arm's own fetched true-audio seconds.
    serve_padded_tp = serve_bucketed_tp = None
    serve_arm_audio = {}
    if not _over_budget():
        stamp("mixed_serve")
        from phoonnx_tpu.infer.engine import VitsEngine
        from phoonnx_tpu.serve import DynamicBatcher

        sent_lists = [
            [int(v) for v in ids_mix_np[i][:mix_lengths[i]]]
            for i in range(mix_batch)
        ]

        def serve_arm(text_buckets, frame_buckets, label):
            eng = VitsEngine(
                params, hp, text_buckets=text_buckets,
                frame_buckets=frame_buckets, mode="fused",
                frames_per_token=4)

            def one_pass():
                batcher = DynamicBatcher(eng, max_batch=4,
                                         max_wait_ms=50.0,
                                         autostart=False)
                subs = [batcher.submit([s], (0.667, 1.0, 0.8), 0)
                        for s in sent_lists]
                t0 = time.perf_counter()
                batcher.start()
                audio = [s.wait(timeout=600.0) for s in subs]
                dt = time.perf_counter() - t0
                batcher.stop()
                secs = sum(len(a) for a in audio) / sample_rate
                return dt, secs

            one_pass()  # compile the arm's programs
            best = float("inf")
            audio_s = []
            for _ in range(5):
                dt, secs = one_pass()
                best = min(best, dt)
                audio_s.append(secs)
            serve_arm_audio[label] = round(float(np.median(audio_s)), 2)
            return float(np.median(audio_s)) / best

        serve_padded_tp = serve_arm((t_text,), (max_frames,), "padded")
        serve_bucketed_tp = serve_arm(
            (32, 48, 64, 96, 128), (128, 192, 256, 384, 512), "bucketed")
        stamp("mixed_serve_post")

    # Config 3 (device side): diacritizer-shaped aux model (tashkeel
    # biLSTM tagger geometry) on the compiled lowering. Placed early
    # (VERDICT r4 #5: the fused-biLSTM win must land in the OFFICIAL
    # artifact, not only in-session notes).
    tashkeel_ms = tashkeel_wall_ms = None
    if not _over_budget():
        stamp("diacritizer_aux")
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            import bench_aux

            from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

            model, feeds_fn, _state = bench_aux.build_tashkeel()
            runner = JaxGraphRunner(model)
            runner.run(feeds_fn(0, None))  # plan + compile
            runner.run(feeds_fn(1, None))
            times = []
            for i in range(20):
                t0 = time.perf_counter()
                runner.run(feeds_fn(2 + i, None))
                times.append(time.perf_counter() - t0)
            # single dispatch+fetch per call: wall = RTT + device; the
            # tunnel round-trip is not the model's cost. Both numbers
            # go to the artifact — when device time is below the RTT
            # jitter the subtraction floors near 0 and the wall is the
            # honest bound.
            tashkeel_wall_ms = float(np.median(times)) * 1000
            tashkeel_ms = max(tashkeel_wall_ms - rtt * 1000, 0.0)
        except Exception:
            tashkeel_ms = tashkeel_wall_ms = None

    # Client-visible single-call latency (dispatch + compute + full audio
    # fetch; on a remote-tunnel TPU the round-trip dominates)
    fn = jax.jit(forward)
    _fetch(fn(packed, ids, lengths, jax.random.PRNGKey(0))[0])
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _fetch(fn(packed, ids, lengths, jax.random.PRNGKey(100 + i))[0])
        lat.append(time.perf_counter() - t0)
    latency_ms = float(np.median(lat) * 1000)

    # Config 4: ByT5 G2P batch decode (KV-cached while_loop; the
    # reference re-runs the full decoder per token per word).
    byt5_words_per_s = None
    if not _over_budget():
        try:
            import subprocess

            out = subprocess.run(
                [sys.executable, os.path.join("tools", "bench_byt5.py"),
                 "--batch", "16", "--max-length", "16", "--reps", "3"],
                capture_output=True, text=True, timeout=max(
                    60, _BUDGET_S - (time.monotonic() - _T0)),
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in out.stdout.splitlines()[::-1]:
                if line.startswith("{"):
                    byt5_words_per_s = json.loads(line).get("words_per_sec")
                    break
        except Exception:
            byt5_words_per_s = None

    # High preset (piper's "high" voices; 4x medium's decoder FLOPs)
    rtf_high = mfu_high = None
    if not _over_budget():
        stamp("high_preset")
        hp_high = VitsHParams.preset("high", n_vocab=161)
        params_high = vits_model.pack_decoder_params(
            jax.device_put(vits_model.random_params(jax.random.PRNGKey(0),
                                                    hp_high)),
            hp_high, max_frames)
        gflops_high = flops_mod.infer_gflops(hp_high, t_text, max_frames)

        def forward_high(params, ids, lengths, rng):
            audio, y_lengths, _ = vits_model.infer(
                params, hp_high, ids, lengths, max_frames=max_frames,
                noise_scale=jnp.float32(0.667),
                length_scale=jnp.float32(1.0),
                noise_w=jnp.float32(0.8),
                rng=rng,
            )
            return audio, y_lengths

        @jax.jit
        def chain_high(params, ids, lengths, base_rng):
            def body(i, acc):
                rng = jax.random.fold_in(base_rng, i)
                audio, _ = forward_high(params, ids, lengths, rng)
                return acc + audio[:, ::1997].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

        _fetch(chain_high(params_high, ids, lengths, jax.random.PRNGKey(0)))
        best_high = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _fetch(chain_high(params_high, ids, lengths,
                              jax.random.PRNGKey(rep + 1)))
            best_high = min(best_high, time.perf_counter() - t0)
        step_high = max(best_high - rtt, 1e-9) / N_CHAIN
        rtf_high = step_high / audio_seconds
        mfu_high = gflops_high * 1e9 / step_high / peak_flops

    # Config 2: multi-speaker voice (VCTK-sized), per-step speaker ids.
    ms_device_ms = None
    if not _over_budget():
        hp_ms = VitsHParams.preset("medium", n_vocab=161, n_speakers=109,
                                   gin_channels=512)
        params_ms = vits_model.pack_decoder_params(
            jax.device_put(vits_model.random_params(jax.random.PRNGKey(1),
                                                    hp_ms)),
            hp_ms, max_frames)

        @jax.jit
        def chain_ms(params, ids, lengths, base_rng):
            def body(i, acc):
                rng = jax.random.fold_in(base_rng, i)
                audio, _, _ = vits_model.infer(
                    params, hp_ms, ids, lengths, max_frames=max_frames,
                    noise_scale=jnp.float32(0.667),
                    length_scale=jnp.float32(1.0),
                    noise_w=jnp.float32(0.8),
                    sid=jnp.remainder(jnp.full((1,), i, jnp.int32), 109),
                    rng=rng,
                )
                return acc + audio[:, ::1997].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

        _fetch(chain_ms(params_ms, ids, lengths, jax.random.PRNGKey(0)))
        best_ms = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _fetch(chain_ms(params_ms, ids, lengths,
                            jax.random.PRNGKey(rep + 1)))
            best_ms = min(best_ms, time.perf_counter() - t0)
        ms_device_ms = max(best_ms - rtt, 1e-9) / N_CHAIN * 1000

    # Streaming: time-to-first-audio via the chunked vocoder decode
    # (wall clock to the first fetched chunk — already an honest barrier)
    ttfa_ms = None
    if not _over_budget():
        from phoonnx_tpu.infer.engine import VitsEngine

        engine = VitsEngine(params, hp, text_buckets=(128,),
                            frame_buckets=(512,))
        ids_list = [int(x) for x in np.asarray(ids)[0]]
        for _ in range(2):  # compile phase1/latents/chunk programs
            for _chunk in engine.synthesize_ids_streaming(
                    ids_list, chunk_frames=128, overlap_frames=32, seed=0):
                break
        ttfa = []
        for i in range(10):
            t0 = time.perf_counter()
            for _chunk in engine.synthesize_ids_streaming(
                    ids_list, chunk_frames=128, overlap_frames=32, seed=i):
                ttfa.append(time.perf_counter() - t0)
                break
        ttfa_ms = float(np.median(ttfa) * 1000)

    # Config 3 (host side): the non-IPA Hangul front-end — hangul2ipa
    # G2P + phonemes_to_ids over a CORPUS-DERIVED id map (the
    # preprocess-style inventory map, ref preprocess.py:526-552). The
    # default 161-symbol IPA map lacks some hangul2ipa outputs, so using
    # it here would silently skip symbols (VERDICT r3 #5) — the corpus
    # map covers the front-end's real inventory and the path is
    # warning-clean.
    from phoonnx_tpu.phoneme_ids import phonemes_to_ids
    from phoonnx_tpu.thirdparty.hangul2ipa import hangul2ipa

    ko_texts = ["안녕하세요 만나서 반갑습니다", "오늘 날씨가 참 좋네요",
                "한국어 음성 합성 시스템입니다"]
    ko_phonemes = [list(hangul2ipa(t)) for t in ko_texts]
    inventory = sorted({p for ph in ko_phonemes for p in ph})
    ko_map = {"_": [0], "^": [1], "$": [2], " ": [3]}
    for sym in inventory:
        if sym not in ko_map:
            ko_map[sym] = [len(ko_map)]
    t0 = time.perf_counter()
    n_frontend = 20
    for _ in range(n_frontend):
        ipa = hangul2ipa(ko_texts[0])
        ko_ids = phonemes_to_ids(list(ipa), id_map=ko_map)
    hangul_ms = (time.perf_counter() - t0) / n_frontend * 1000

    # Config 3 (device side): ids -> audio through a voice whose
    # embedding table is sized to that corpus map, so the number covers
    # the real non-IPA path end to end (G2P + tokenize above, synthesis
    # here).
    non_ipa_device_ms = None
    if not _over_budget():
        hp_ko = VitsHParams.preset("medium", n_vocab=len(ko_map))
        packed_ko = vits_model.pack_decoder_params(
            jax.device_put(vits_model.random_params(jax.random.PRNGKey(2),
                                                    hp_ko)),
            hp_ko, max_frames)
        ko_arr = np.zeros((1, t_text), np.int32)
        ko_trim = ko_ids[:t_text]
        ko_arr[0, :len(ko_trim)] = ko_trim
        ids_ko = jnp.asarray(ko_arr)
        lengths_ko = jnp.asarray([len(ko_trim)], jnp.int32)

        @jax.jit
        def chain_ko(params, ids_c, lengths_c, base_rng):
            def body(i, acc):
                rng = jax.random.fold_in(base_rng, i)
                audio, _, _ = vits_model.infer(
                    params, hp_ko, ids_c, lengths_c,
                    max_frames=max_frames,
                    noise_scale=jnp.float32(0.667),
                    length_scale=jnp.float32(1.0),
                    noise_w=jnp.float32(0.8),
                    rng=rng,
                )
                return acc + audio[:, ::1997].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

        _fetch(chain_ko(packed_ko, ids_ko, lengths_ko,
                        jax.random.PRNGKey(0)))
        best_ko = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _fetch(chain_ko(packed_ko, ids_ko, lengths_ko,
                            jax.random.PRNGKey(rep + 1)))
            best_ko = min(best_ko, time.perf_counter() - t0)
        non_ipa_device_ms = max(best_ko - rtt, 1e-9) / N_CHAIN * 1000

    # headline re-measure (same compiled program; keep the better
    # window, stamped so the artifact shows WHICH window it came from)
    stamp("headline_post")
    step_s2 = chained_seconds(packed, ids, lengths, reps=5, key_base=100)
    step_s = min(step_s, step_s2)
    rtf = step_s / audio_seconds
    mfu_single = gflops_utt * 1e9 / step_s / peak_flops

    # post-run calibration brackets contention drift; normalized twins
    # use the bracket mean so round-over-round history is auditable
    peak_flops_post = calibrate()
    cal_mean = (peak_flops + peak_flops_post) / 2.0
    norm = cal_mean / REF_PEAK_F32  # <1 = chip slower than ref state

    def rnd(v, n=1):
        return None if v is None else round(v, n)

    result = {
        "metric": "rtf_vits_medium_22k05",
        "value": round(rtf, 6),
        "unit": "s_compute_per_s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "extra": {
            "chip_state": chip_state,
            "window_gate_attempts_tflops": window_attempts,
            "cal_stamps_tflops": cal_stamps,
            "audio_sec_per_sec_per_chip": round(1.0 / rtf, 1),
            "device_ms_per_utterance": round(step_s * 1000, 3),
            "device_ms_per_utterance_norm225": round(
                step_s * 1000 * norm, 3),
            "audio_sec_per_sec_norm225": round(1.0 / rtf / norm, 1),
            "client_latency_ms_incl_fetch": round(latency_ms, 2),
            "rtt_ms": round(rtt * 1000, 2),
            "batch16_fp32_audio_sec_per_sec": batch16_fp32,
            "batch16_bf16_audio_sec_per_sec": batch16_bf16,
            "batch_sweep": sweep,
            "peak_audio_sec_per_sec": rnd(peak_tp),
            "peak_audio_sec_per_sec_norm225": rnd(
                None if peak_tp == 0 else peak_tp / norm),
            "peak_vs_single_stream": rnd(
                None if peak_tp == 0 else peak_tp * rtf, 3),
            "peak_vs_single_stream_same_dtype": rnd(
                batch_gain_same_session, 3),
            "mixed_length_b16_audio_sec_per_sec": rnd(mixed_tp),
            "mixed_serve_padded_audio_sec_per_sec": rnd(serve_padded_tp),
            "mixed_serve_bucketed_audio_sec_per_sec": rnd(
                serve_bucketed_tp),
            "mixed_serve_audio_sec_per_pass": serve_arm_audio,
            "saturating_batch": peak_cfg,
            "mfu_at_peak": rnd(peak_mfu, 4),
            "rtf_high_preset_fp32": rnd(rtf_high, 6),
            "calibrated_peak_tflops_pre": round(peak_flops / 1e12, 1),
            "calibrated_peak_tflops_post": round(
                peak_flops_post / 1e12, 1),
            "calibration_norm_factor": round(norm, 4),
            "model_gflop_per_utterance": round(gflops_utt, 2),
            "flop_source": "analytic (phoonnx_tpu.flops)",
            "mfu": round(mfu_single, 4),
            "mfu_high_preset": rnd(mfu_high, 4),
            "multispeaker_device_ms_per_utterance": rnd(ms_device_ms, 3),
            "streaming_ttfa_ms": rnd(ttfa_ms, 2),
            "hangul_frontend_ms_per_utterance": round(hangul_ms, 2),
            "non_ipa_device_ms": rnd(non_ipa_device_ms, 3),
            "diacritizer_aux_device_ms": rnd(tashkeel_ms, 2),
            "diacritizer_aux_wall_ms": rnd(tashkeel_wall_ms, 2),
            "byt5_words_per_s": rnd(byt5_words_per_s),
            "frames": max_frames,
            "bench_wall_s": round(time.monotonic() - _T0, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
