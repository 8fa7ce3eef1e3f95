"""Bucketed VITS synthesis engine for TPU.

XLA compiles one program per input shape, so variable-length synthesis is
dispatched over a small set of static buckets:

* phase 1 (text encoder + duration predictor) is compiled per
  (batch, text-bucket);
* phase 2 (prior expansion + inverse flow + HiFi-GAN) is compiled per
  (batch, text-bucket, frame-bucket), with the frame bucket chosen on host
  from the predicted durations (the reference's dynamic output length,
  models.py:702-704, is the one data-dependent shape in the graph).

A ``fused`` mode compiles the whole pipeline as ONE program per
(batch, text-bucket) with a frame budget derived from the bucket — no
host synchronisation mid-utterance (best when host<->device latency is
high); ``synthesize_many`` pipelines utterances via async dispatch. Padded
lanes are masked everywhere. The first call per bucket pays the XLA
compile; ``warmup()`` precompiles the common grid.
"""

import contextlib
import logging
import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phoonnx_tpu.models.vits import model as vits_model
from phoonnx_tpu.models.vits.model import VitsHParams

LOG = logging.getLogger(__name__)

DEFAULT_TEXT_BUCKETS = (32, 64, 128, 256, 512, 1024)
DEFAULT_FRAME_BUCKETS = (64, 128, 256, 384, 512, 768, 1024, 1536, 2048,
                         3072, 4096)


def cast_floating(params, dtype):
    """Cast every floating leaf of a parameter pytree to ``dtype``."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


def _prec_scope(name: Optional[str]):
    """Trace-time matmul-precision scope (no-op when name is None)."""
    return (jax.default_matmul_precision(name) if name
            else contextlib.nullcontext())


def _bucket_for(value: int, buckets: Sequence[int]) -> int:
    for bucket in buckets:
        if value <= bucket:
            return bucket
    raise ValueError(
        f"length {value} exceeds largest bucket {buckets[-1]}"
    )


class VitsEngine:
    """Compiled VITS synthesis over static shape buckets."""

    # batched synthesis runs as ONE device program whose compile key
    # includes the lane count (the serving batcher pads lanes to
    # power-of-two buckets because of this)
    compiled_batching = True

    def __init__(
        self,
        params,
        hp: VitsHParams,
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
        dtype: str = "float32",
        mode: str = "two_phase",
        frames_per_token: int = 12,
        fetch_pcm16: bool = False,
        device=None,
        matmul_precision: Optional[str] = None,
    ):
        """mode:

        * ``"fused"``: one device dispatch per call; the frame
          budget is ``frames_per_token * text_bucket`` rounded to a frame
          bucket. No host synchronisation between the duration predictor
          and the decoder — essential when host<->device latency is high
          (remote TPU tunnels), and 12 frames/token is ~3x the worst
          durations real voices produce (hop 256 @ 22 kHz).
        * ``"two_phase"`` (default): predict durations, sync to host,
          decode at the tightest frame bucket. Minimises FLOPs and audio
          transfer bytes per utterance; one extra host round-trip.

        fetch_pcm16: quantise audio to int16 on device before fetching
        (4x fewer bytes over the host link; the WAV output is 16-bit
        anyway). Host converts back to float32 in [-1, 1].

        device: a ``jax.Device`` to pin this engine's parameters (and
        therefore every dispatch — computation follows the committed
        operand) to. None = the process default device. Serving uses
        one engine per chip (`replicate` / serve.py --devices) for
        linear multi-chip scale; no cross-device collectives are
        involved, the model fits one chip by orders of magnitude.

        matmul_precision: dot/conv precision for every compiled program
        (None = backend default). On TPU, f32 matmuls default to
        bf16-rounded multiplies with f32 accumulation — measured
        max-waveform deviation vs a CPU f32 oracle is 2.6e-4 on the
        medium preset (within the <1e-3 fidelity target). "highest"
        runs true-f32 multi-pass dots everywhere (measured 8.7e-7
        deviation, ~3.5x single-stream device time) for
        exactness-critical work; "high" = bf16x3 for the XLA ops while
        the Pallas kernels upgrade themselves to true f32 (Mosaic has
        no bf16x3 mode).
        """
        self.hp = hp
        self.text_buckets = tuple(text_buckets)
        self.frame_buckets = tuple(frame_buckets)
        self.mode = mode
        self.frames_per_token = frames_per_token
        self.fetch_pcm16 = fetch_pcm16
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.dtype_str = dtype
        self.device = device
        self.matmul_precision = matmul_precision
        if dtype == "bfloat16":
            params = cast_floating(params, jnp.bfloat16)
        # Frame-independent fused-kernel specs (text encoder + inverse
        # flow) attach to the engine's base params, not only the packed
        # decoder copies: phase-1/latents/streaming programs run on
        # self.params, and without this the single-stream flow reversal
        # — the case the fused flow kernel exists for — stayed on the
        # ~26-small-conv XLA path.
        params = vits_model.attach_fused_specs(params)
        self.params = (jax.device_put(params, device) if device is not None
                       else jax.device_put(params))
        self._packed_by_sig = {}
        self._packed_by_frames = {}
        self._phase1 = {}
        self._phase2 = {}
        self._fused = {}
        self._latents = {}
        self._decode_chunk = {}
        self._first_chunk = {}

    def _params_for_frames(self, t_frames: int):
        """Params view with the decoder's packed kernels precomputed for a
        ``t_frames``-frame decode (vits_model.pack_decoder_params).

        The channel-packed vocoder stages otherwise rebuild their
        block-diagonal kernels inside EVERY compiled call — XLA cannot
        hoist the construction because weights are runtime inputs
        (profiled at ~40% of single-utterance decode device time on v5e).
        Packing is placement-only (bit-identical output), and the decoder
        falls back to the in-graph build wherever a schedule mismatches,
        so this is purely a speedup. Copies are deduped by pack schedule:
        most frame buckets share one schedule, so HBM holds one packed
        copy. Phase-1/latents programs (no decoder) keep ``self.params``.
        """
        hit = self._packed_by_frames.get(t_frames)
        if hit is not None:
            return hit
        sig = vits_model.decoder_pack_schedule(self.params, self.hp,
                                               t_frames)
        packed = self._packed_by_sig.get(sig)
        if packed is None:
            packed = vits_model.pack_decoder_params(self.params, self.hp,
                                                    t_frames)
            # built from the committed params, so it already lives on
            # self.device; a bare device_put would move it to the default
            packed = (jax.device_put(packed, self.device)
                      if self.device is not None else jax.device_put(packed))
            self._packed_by_sig[sig] = packed
        self._packed_by_frames[t_frames] = packed
        return packed

    def replicate(self, devices) -> List["VitsEngine"]:
        """One engine per device, sharing this engine's configuration.

        Returns [self-or-repin, engine@dev1, ...]: element 0 reuses this
        engine when it already sits on ``devices[0]`` (no weight copy).
        Each replica holds its own parameter copy in its chip's HBM and
        its own compiled-program cache; serving fans requests out across
        them (BatcherPool) for linear multi-chip throughput.
        """
        out = []
        for dev in devices:
            if dev == self.device or (self.device is None and not out):
                if self.device is None and dev is not None:
                    # adopt the placement: the default device need not be
                    # devices[0]
                    self.params = jax.device_put(self.params, dev)
                    self._packed_by_sig.clear()
                    self._packed_by_frames.clear()
                self.device = dev
                out.append(self)
                continue
            out.append(VitsEngine(
                self.params, self.hp, text_buckets=self.text_buckets,
                frame_buckets=self.frame_buckets, dtype=self.dtype_str,
                mode=self.mode, frames_per_token=self.frames_per_token,
                fetch_pcm16=self.fetch_pcm16, device=dev,
                matmul_precision=self.matmul_precision,
            ))
        return out

    # -- compiled phases -------------------------------------------------

    def _get_phase1(self, batch: int, t_bucket: int):
        key = (batch, t_bucket)
        if key not in self._phase1:
            hp = self.hp
            prec = self.matmul_precision

            @partial(jax.jit, static_argnames=())
            def phase1(params, ids, lengths, length_scale, noise_w, sid, rng):
                with _prec_scope(prec):
                    return vits_model.infer_durations(
                        params, hp, ids, lengths, length_scale, noise_w,
                        sid=sid if hp.n_speakers > 1 else None, rng=rng,
                    )

            self._phase1[key] = phase1
        return self._phase1[key]

    def _get_phase2(self, batch: int, t_bucket: int, f_bucket: int):
        key = (batch, t_bucket, f_bucket)
        if key not in self._phase2:
            hp = self.hp
            prec = self.matmul_precision

            @partial(jax.jit, static_argnames=("max_frames",))
            def phase2(params, m_p, logs_p, w_ceil, x_mask, g, noise_scale,
                       rng, max_frames):
                with _prec_scope(prec):
                    return vits_model.infer_decode(
                        params, hp, m_p, logs_p, w_ceil, x_mask, max_frames,
                        noise_scale, g=g, rng=rng,
                    )

            self._phase2[key] = partial(phase2, max_frames=f_bucket)
        return self._phase2[key]

    def _get_fused(self, batch: int, t_bucket: int, f_bucket: int):
        key = (batch, t_bucket, f_bucket)
        if key not in self._fused:
            hp = self.hp
            prec = self.matmul_precision

            @partial(jax.jit, static_argnames=("max_frames",))
            def fused(params, ids, lengths, noise_scale, length_scale,
                      noise_w, sid, rng, max_frames):
                with _prec_scope(prec):
                    audio, y_lengths, _ = vits_model.infer(
                        params, hp, ids, lengths, max_frames=max_frames,
                        noise_scale=noise_scale, length_scale=length_scale,
                        noise_w=noise_w,
                        sid=sid if hp.n_speakers > 1 else None, rng=rng,
                    )
                return audio, y_lengths

            self._fused[key] = partial(fused, max_frames=f_bucket)
        return self._fused[key]

    def _get_latents(self, batch: int, t_bucket: int, f_bucket: int):
        key = (batch, t_bucket, f_bucket)
        if key not in self._latents:
            hp = self.hp
            prec = self.matmul_precision

            @partial(jax.jit, static_argnames=("max_frames",))
            def latents(params, m_p, logs_p, w_ceil, x_mask, g, noise_scale,
                        rng, max_frames):
                with _prec_scope(prec):
                    return vits_model.infer_latents(
                        params, hp, m_p, logs_p, w_ceil, x_mask, max_frames,
                        noise_scale, g=g, rng=rng,
                    )

            self._latents[key] = partial(latents, max_frames=f_bucket)
        return self._latents[key]

    def _get_decode_chunk(self, batch: int, total_frames: int,
                          chunk: int, overlap: int):
        """Decoder program over a sliding latent window.

        The decoder families are translation-invariant convolutional stacks
        (stride-1 convs + integer-factor transposed convs), so decoding a
        window with >= ``overlap`` frames of context on each side of the
        kept span reproduces the monolithic decode exactly on that span.
        The window is clamped inside the real latent buffer — it is NEVER
        zero-padded, because zero latent *frames* are not equivalent to the
        convolutions' own zero padding (biases propagate through the
        stack); instead the window start and the kept-span offset are
        traced scalars, so the true utterance edges see exactly the
        monolithic layer-level padding and ONE compiled program serves
        every chunk position of a given latent length.
        """
        key = (batch, total_frames, chunk, overlap)
        if key not in self._decode_chunk:
            hp = self.hp
            window = min(chunk + 2 * overlap, total_frames)
            up = hp.total_upsample
            prec = self.matmul_precision

            @jax.jit
            def decode_chunk(params, z, start, offset, y_len, g):
                with _prec_scope(prec):
                    zc = jax.lax.dynamic_slice_in_dim(z, start, window,
                                                      axis=1)
                    # frames past the true utterance length are masked in
                    # the decoder so chunked output matches the
                    # exact-length monolithic decode (decode_audio's
                    # frame_lengths contract)
                    valid = jnp.broadcast_to(
                        jnp.clip(y_len - start, 0, window).astype(jnp.int32),
                        (zc.shape[0],))
                    audio = vits_model.decode_audio(params, hp, zc, g=g,
                                                    frame_lengths=valid)
                    return jax.lax.dynamic_slice_in_dim(
                        audio, offset * up, chunk * up, axis=1)

            self._decode_chunk[key] = decode_chunk
        return self._decode_chunk[key]

    # right context (frames) the inverse coupling flow reads past any
    # output frame: 4 couplings x WN(4 layers, k=5, d=1) x (5-1)/2.
    # Latents computed on a prefix of this much extra context are
    # bit-equal to the full-bucket latents on the used span.
    _FLOW_CONTEXT = 32

    def _get_first_chunk(self, t_bucket: int, chunk: int, overlap: int):
        """ONE program for time-to-first-audio: encoder + durations +
        prefix latents + the first decoder window, fused so the first
        audio needs a single dispatch/fetch round-trip instead of three
        (phase1 -> latents -> chunk each paid the tunnel RTT; VERDICT
        r3 #7). The latent prefix carries _FLOW_CONTEXT extra frames so
        the flow's right context makes the used span bit-equal to the
        full-bucket latents the remaining chunks are decoded from (the
        prior noise matches because threefry bits are keyed by flat
        position, identical on a common prefix).
        """
        key = (t_bucket, chunk, overlap)
        if key not in self._first_chunk:
            hp = self.hp
            prec = self.matmul_precision
            window = chunk + 2 * overlap
            prefix = window + self._FLOW_CONTEXT
            up = hp.total_upsample

            @jax.jit
            def first_chunk(params, ids, lengths, noise_scale,
                            length_scale, noise_w, sid, rng1, rng2):
                with _prec_scope(prec):
                    m_p, logs_p, w_ceil, x_mask, g = (
                        vits_model.infer_durations(
                            params, hp, ids, lengths, length_scale,
                            noise_w,
                            sid=sid if hp.n_speakers > 1 else None,
                            rng=rng1,
                        ))
                    z_pre, y_lengths = vits_model.infer_latents(
                        params, hp, m_p, logs_p, w_ceil, x_mask, prefix,
                        noise_scale, g=g, rng=rng2,
                    )
                    valid = jnp.clip(y_lengths, 0, window).astype(
                        jnp.int32)
                    audio = vits_model.decode_audio(
                        params, hp, z_pre[:, :window], g=g,
                        frame_lengths=valid)
                    audio = jax.lax.slice_in_dim(
                        audio, 0, chunk * up, axis=1)
                return audio, m_p, logs_p, w_ceil, x_mask, g, y_lengths

            self._first_chunk[key] = first_chunk
        return self._first_chunk[key]

    @staticmethod
    @jax.jit
    def _to_pcm16(audio):
        return jnp.clip(audio * 32767.0, -32767.0, 32767.0).astype(jnp.int16)

    def _fetch_audio(self, audio) -> np.ndarray:
        if self.fetch_pcm16:
            pcm = self._to_pcm16(audio)
            return np.asarray(pcm).astype(np.float32) / 32767.0
        return np.asarray(audio, np.float32)

    @staticmethod
    def _start_host_copies(*bufs) -> None:
        """Begin all device->host copies before blocking on any: each
        blocking fetch on a tunnel backend pays a full round-trip."""
        for buf in bufs:
            if hasattr(buf, "copy_to_host_async"):
                buf.copy_to_host_async()

    # -- public API ------------------------------------------------------

    def _frame_bucket_clamped(self, frames: int) -> int:
        """Frame bucket for a predicted length; clamps to the largest
        bucket with a truncation warning instead of raising (fused-mode
        semantics — length_scale is request-controlled in serving, so an
        over-long prediction must degrade, not 500)."""
        if frames > self.frame_buckets[-1]:
            LOG.warning(
                "predicted %d frames exceed the largest frame bucket %d "
                "— audio will be truncated", frames, self.frame_buckets[-1],
            )
            return self.frame_buckets[-1]
        return _bucket_for(max(frames, 1), self.frame_buckets)

    def _check_speakers(self, speaker_ids) -> None:
        """Out-of-range ids would be CLAMPED by jnp.take under jit,
        silently synthesizing another speaker."""
        n = self.hp.n_speakers
        if n <= 1:
            return  # single-speaker graphs ignore sid (reference behavior)
        for sid in speaker_ids:
            if not 0 <= int(sid) < n:
                raise ValueError(
                    f"speaker_id {sid} out of range: voice has {n} "
                    f"speakers (0..{n - 1})"
                )

    def synthesize_ids(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_w: float = 0.8,
        speaker_id: int = 0,
        seed: Optional[int] = None,
        lang_id: Optional[int] = None,
    ) -> np.ndarray:
        """One utterance -> float32 waveform (trimmed to true length).

        ``lang_id`` is accepted for API parity but unused: the VITS family
        has no language embedding (the reference feeds ``langid`` only to
        graphs that declare it, voice.py:350-377 — multi-lang foreign
        graphs run on the fallback interpreter engine, which consumes it).
        """
        if lang_id:
            LOG.debug("lang_id=%s ignored: VITS graph has no language "
                      "conditioning", lang_id)
        audio, lengths = self.synthesize_batch(
            [phoneme_ids], noise_scale=noise_scale,
            length_scale=length_scale, noise_w=noise_w,
            speaker_ids=[speaker_id], seed=seed,
        )
        return audio[0][: lengths[0] * self.hp.total_upsample]

    def synthesize_ids_streaming(
        self,
        phoneme_ids: Sequence[int],
        chunk_frames: int = 128,
        overlap_frames: int = 32,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_w: float = 0.8,
        speaker_id: int = 0,
        seed: Optional[int] = None,
        lang_id: Optional[int] = None,
    ):
        """Yield the waveform in chunks as the decoder produces them.
        ``lang_id`` is accepted for API parity and unused (no language
        conditioning in the VITS graph).

        Time-to-first-audio path: the encoder/duration/flow stages run
        once (they are cheap), then the HiFi-GAN decoder — which holds
        ~all the FLOPs after its 256x upsampling — runs per
        ``chunk_frames`` latent frames (~1.5 s of audio at hop 256 /
        22 kHz for the default 128). Every chunk after the first is
        dispatched before the previous one is fetched, so device compute
        overlaps host transfer. ``overlap_frames`` context frames on each
        side keep the chunked output identical to the monolithic decode
        (32 covers every preset's decoder receptive field; verified in
        tests/test_streaming.py). With the same ``seed`` the concatenated
        stream equals :meth:`synthesize_ids` output.

        Capability beyond the reference (phoonnx/tts.py synthesize yields
        only whole-sentence chunks, one onnxruntime run each).
        """
        t_bucket = _bucket_for(len(phoneme_ids), self.text_buckets)
        ids = np.zeros((1, t_bucket), np.int32)
        ids[0, : len(phoneme_ids)] = phoneme_ids
        lengths = np.asarray([len(phoneme_ids)], np.int32)
        self._check_speakers((speaker_id,))
        sid = np.asarray([speaker_id], np.int32)
        rng = jax.random.PRNGKey(seed if seed is not None else
                                 np.random.randint(0, 2 ** 31 - 1))
        rng1, rng2 = jax.random.split(rng)

        chunk = max(1, chunk_frames)
        overlap = max(0, overlap_frames)
        window = chunk + 2 * overlap
        up = self.hp.total_upsample

        # first audio in ONE dispatch: encoder + durations + prefix
        # latents + first decoder window, fused (see _get_first_chunk)
        dec_params = self._params_for_frames(window)
        first = self._get_first_chunk(t_bucket, chunk, overlap)
        audio1, m_p, logs_p, w_ceil, x_mask, g, _y_pre = first(
            dec_params, jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(noise_scale, self.dtype),
            jnp.asarray(length_scale, self.dtype),
            jnp.asarray(noise_w, self.dtype),
            jnp.asarray(sid), rng1, rng2,
        )
        if self.fetch_pcm16:
            audio1 = self._to_pcm16(audio1)
        # overlap the bookkeeping fetch with the audio fetch
        w_sum = jnp.sum(w_ceil, axis=-1)
        for buf in (w_sum, audio1):
            if hasattr(buf, "copy_to_host_async"):
                buf.copy_to_host_async()
        wav1 = np.asarray(audio1)
        wav1 = (wav1.astype(np.float32) / 32767.0 if self.fetch_pcm16
                else wav1.astype(np.float32))
        frames = int(np.max(np.asarray(w_sum)))
        f_bucket = self._frame_bucket_clamped(frames)
        n_frames = max(min(frames, f_bucket), 1)
        total_samples = n_frames * up

        yield wav1[0, :min(chunk, n_frames) * up]
        if n_frames <= chunk:
            return

        # remaining chunks decode from the full-bucket latents (their
        # common prefix is bit-equal to the fused program's prefix)
        latents = self._get_latents(1, t_bucket, f_bucket)
        z, _y_lengths = latents(
            self.params, m_p, logs_p, w_ceil, x_mask, g,
            jnp.asarray(noise_scale, self.dtype), rng2,
        )
        t_total = z.shape[1]
        if window >= t_total:
            # window covers the whole buffer — one monolithic tail
            audio = self._get_decode_chunk(1, t_total, t_total, 0)(
                self._params_for_frames(t_total), z,
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(n_frames, jnp.int32), g,
            )
            if self.fetch_pcm16:
                audio = self._to_pcm16(audio)
            wav = np.asarray(audio)
            wav = (wav.astype(np.float32) / 32767.0 if self.fetch_pcm16
                   else wav.astype(np.float32))
            yield wav[0, chunk * up:total_samples]
            return

        n_chunks = max(1, math.ceil(n_frames / chunk))
        decode = self._get_decode_chunk(1, t_total, chunk, overlap)

        in_flight = []
        for i in range(1, n_chunks):
            # clamp the window inside the real latent buffer so the kept
            # span always has >= overlap frames of true context (or the
            # true utterance edge) on each side
            start = min(max(i * chunk - overlap, 0), t_total - window)
            offset = i * chunk - start
            # when the final chunk's nominal span [i*chunk, i*chunk+chunk)
            # overruns the latent buffer, keep the buffer's last `chunk`
            # frames instead (offset capped so dynamic_slice stays
            # in-bounds) and skip the already-emitted prefix on emission
            skip = 0
            if offset > window - chunk:
                offset = window - chunk
                skip = (i * chunk - (start + offset)) * up
            audio = decode(dec_params, z, jnp.asarray(start, jnp.int32),
                           jnp.asarray(offset, jnp.int32),
                           jnp.asarray(n_frames, jnp.int32), g)
            if self.fetch_pcm16:
                audio = self._to_pcm16(audio)
            in_flight.append((audio, skip))
        emitted = chunk * up  # the fused first chunk
        for audio, skip in in_flight:
            wav = np.asarray(audio)
            wav = (wav.astype(np.float32) / 32767.0 if self.fetch_pcm16
                   else wav.astype(np.float32))
            take = min(wav.shape[1] - skip, total_samples - emitted)
            if take <= 0:
                break
            emitted += take
            yield wav[0, skip:skip + take]

    def synthesize_batch(
        self,
        batch_ids: Sequence[Sequence[int]],
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_w: float = 0.8,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        lang_id: Optional[int] = None,
    ) -> Tuple[np.ndarray, List[int]]:
        """Batched synthesis with bucketed padding. ``lang_id`` is
        accepted for API parity and unused (no language conditioning in
        the VITS graph).

        Returns (waveforms [B, F_bucket*upsample] float32, frame lengths).
        """
        batch = len(batch_ids)
        if speaker_ids is not None:
            self._check_speakers(speaker_ids)
        max_len = max(len(ids) for ids in batch_ids)
        t_bucket = _bucket_for(max_len, self.text_buckets)

        ids = np.zeros((batch, t_bucket), np.int32)
        lengths = np.zeros((batch,), np.int32)
        for i, utt in enumerate(batch_ids):
            ids[i, : len(utt)] = utt
            lengths[i] = len(utt)

        sid = np.zeros((batch,), np.int32)
        if speaker_ids is not None:
            sid[:] = speaker_ids

        rng = jax.random.PRNGKey(seed if seed is not None else
                                 np.random.randint(0, 2 ** 31 - 1))
        rng1, rng2 = jax.random.split(rng)

        if self.mode == "fused":
            # budget from the *bucket* (not the raw length) so each
            # (batch, text-bucket) pair compiles exactly once
            budget = t_bucket * self.frames_per_token
            f_bucket = _bucket_for(
                min(budget, self.frame_buckets[-1]), self.frame_buckets
            )
            fused = self._get_fused(batch, t_bucket, f_bucket)
            audio, y_lengths = fused(
                self._params_for_frames(f_bucket),
                jnp.asarray(ids), jnp.asarray(lengths),
                jnp.asarray(noise_scale, self.dtype),
                jnp.asarray(length_scale, self.dtype),
                jnp.asarray(noise_w, self.dtype),
                jnp.asarray(sid), rng1,
            )
            audio_np = self._fetch_audio(audio)
            frame_lengths = [int(n) for n in np.asarray(y_lengths)]
            if any(n >= f_bucket for n in frame_lengths):
                LOG.warning(
                    "frame budget %d reached — audio may be truncated; "
                    "raise frames_per_token or use mode='two_phase'",
                    f_bucket,
                )
            return audio_np, frame_lengths

        phase1 = self._get_phase1(batch, t_bucket)
        m_p, logs_p, w_ceil, x_mask, g = phase1(
            self.params, jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(length_scale, self.dtype),
            jnp.asarray(noise_w, self.dtype),
            jnp.asarray(sid), rng1,
        )

        # Host decision: pick the frame bucket from predicted durations.
        frames = int(np.max(np.asarray(jnp.sum(w_ceil, axis=-1))))
        f_bucket = self._frame_bucket_clamped(frames)

        phase2 = self._get_phase2(batch, t_bucket, f_bucket)
        audio, y_lengths = phase2(
            self._params_for_frames(f_bucket), m_p, logs_p, w_ceil,
            x_mask, g,
            jnp.asarray(noise_scale, self.dtype), rng2,
        )
        if not self.fetch_pcm16:
            self._start_host_copies(audio, y_lengths)
        audio_np = self._fetch_audio(audio)
        return audio_np, [int(n) for n in np.asarray(y_lengths)]

    def synthesize_many(
        self,
        utterances: Sequence[Sequence[int]],
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_w: float = 0.8,
        speaker_id: int = 0,
        seed: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Pipelined synthesis of many utterances (streaming workloads).

        Dispatches every utterance through the fused single-call program
        without blocking (JAX async dispatch), then fetches results in
        order — device compute and host transfers overlap, so sustained
        throughput approaches pure device time even when each host<->device
        round-trip is slow (remote TPU tunnels).
        """
        self._check_speakers((speaker_id,))
        base_seed = seed if seed is not None else np.random.randint(
            0, 2 ** 31 - 1)
        in_flight = []
        for i, utt in enumerate(utterances):
            t_bucket = _bucket_for(len(utt), self.text_buckets)
            budget = t_bucket * self.frames_per_token
            f_bucket = _bucket_for(
                min(budget, self.frame_buckets[-1]), self.frame_buckets
            )
            fused = self._get_fused(1, t_bucket, f_bucket)
            ids = np.zeros((1, t_bucket), np.int32)
            ids[0, : len(utt)] = utt
            audio, y_lengths = fused(
                self._params_for_frames(f_bucket), jnp.asarray(ids),
                jnp.asarray([len(utt)], jnp.int32),
                jnp.asarray(noise_scale, self.dtype),
                jnp.asarray(length_scale, self.dtype),
                jnp.asarray(noise_w, self.dtype),
                jnp.asarray([speaker_id], jnp.int32),
                jax.random.PRNGKey(base_seed + i),
            )
            if self.fetch_pcm16:
                audio = self._to_pcm16(audio)
            in_flight.append((audio, y_lengths))

        outputs: List[np.ndarray] = []
        upsample = self.hp.total_upsample
        for audio, y_lengths in in_flight:
            self._start_host_copies(audio, y_lengths)
            wav = np.asarray(audio)
            if self.fetch_pcm16:
                wav = wav.astype(np.float32) / 32767.0
            else:
                wav = wav.astype(np.float32)
            n_frames = int(np.asarray(y_lengths)[0])
            if n_frames * upsample >= wav.shape[1]:
                LOG.warning(
                    "frame budget %d reached — audio may be truncated; "
                    "raise frames_per_token or use mode='two_phase'",
                    wav.shape[1] // upsample,
                )
            outputs.append(wav[0][:n_frames * upsample])
        return outputs

    def voice_conversion(
        self,
        audio: np.ndarray,
        sid_src: int,
        sid_tgt: int,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Convert an utterance between speakers (models.py:724-732).

        audio: float32 waveform [N] at the model sample rate. Requires a
        multi-speaker voice (posterior-encoder weights are in every
        training checkpoint / weight-only export; executable inference
        graphs keep them as initializers too). Returns the converted
        waveform trimmed to the true length.
        """
        if self.hp.n_speakers <= 1:
            raise ValueError("voice conversion requires a multi-speaker "
                             "model")
        self._check_speakers((sid_src, sid_tgt))
        from phoonnx_tpu.ops.stft import spectrogram

        hp = self.hp
        # derive the STFT geometry from the model itself: the posterior
        # encoder consumes filter_length//2+1 bins at one frame per
        # decoder upsample period (robust when a loaded voice's audio
        # section didn't carry filter/hop values)
        n_fft = (hp.spec_channels - 1) * 2
        hop = hp.total_upsample
        wav = jnp.asarray(np.asarray(audio, np.float32))[None, :]
        spec = spectrogram(wav, n_fft, hop, n_fft)  # [1, T, C]
        n_frames = spec.shape[1]
        f_bucket = _bucket_for(n_frames, self.frame_buckets)
        spec = jnp.pad(spec, ((0, 0), (0, f_bucket - n_frames), (0, 0)))

        key = ("vc", 1, f_bucket)
        if key not in self._fused:
            prec = self.matmul_precision

            @jax.jit
            def vc(params, spec, lengths, sid_src, sid_tgt, rng):
                with _prec_scope(prec):
                    out, _mask = vits_model.voice_conversion(
                        params, hp, spec, lengths, sid_src, sid_tgt, rng,
                    )
                return out

            self._fused[key] = vc
        rng = jax.random.PRNGKey(seed if seed is not None else
                                 np.random.randint(0, 2 ** 31 - 1))
        out = self._fused[key](
            self._params_for_frames(f_bucket), spec.astype(self.dtype),
            jnp.asarray([n_frames], jnp.int32),
            jnp.asarray([sid_src], jnp.int32),
            jnp.asarray([sid_tgt], jnp.int32), rng,
        )
        n = n_frames * hp.total_upsample
        return np.asarray(out, np.float32)[0, :n]

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               text_buckets: Optional[Sequence[int]] = None) -> None:
        """Precompile phase 1 for the given grid (phase 2 compiles lazily)."""
        for batch in batch_sizes:
            for t_bucket in (text_buckets or self.text_buckets[:3]):
                # full-length rows: shorter ids re-bucket to the
                # smallest bucket and nothing else gets compiled
                ids = [[1] * t_bucket] * batch
                self.synthesize_batch(ids, seed=0)
