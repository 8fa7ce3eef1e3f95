"""Fallback engine: execute a foreign ONNX voice graph directly.

The fast path (:class:`~phoonnx_tpu.infer.engine.VitsEngine`) imports
weights by name into the JAX VITS graph — that covers voices exported by
this framework, piper, and the reference trainer (export_onnx.py keeps
state-dict initializer names). Voices whose graphs are NOT that layout
(coqui-VITS exports, mimic3 models, anything else the reference would
simply hand to onnxruntime, reference voice.py:167) cannot be
name-imported; for those this engine interprets the voice's own ONNX
graph with the in-repo executor, preserving the reference's
architecture-agnostic behavior.

Feed contract matches the reference call (voice.py:350-377): ``input``
[1, T] int64, ``input_lengths`` [1] int64, ``scales`` [3] float32
(noise, length, noise_w), plus ``sid``/``langid`` [1] int64 when the
graph declares them.

Execution: the voice's graph is lowered to jitted XLA segments
(:mod:`phoonnx_tpu.onnx.jax_lowering`) so foreign voices get compiled
TPU execution just as onnxruntime gives the reference compiled C++
(reference voice.py:167); ops the lowering cannot stage (control flow,
data-dependent shapes, random draws) replay on the numpy interpreter
between segments. Phoneme-id inputs are padded to length buckets when
the graph declares ``input_lengths`` (masked semantics), bounding XLA
recompilation across sentence lengths. Set ``compile=False`` (or
``PHOONNX_ONNX_FALLBACK_COMPILE=0``) to force pure interpretation.
"""

import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.reader import OnnxModel

LOG = logging.getLogger(__name__)

# phoneme-length buckets: fine-grained at short sentence lengths,
# multiples of 128 beyond (same spirit as the native engine's buckets)
_ID_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def _bucket_len(n: int) -> int:
    for b in _ID_BUCKETS:
        if n <= b:
            return b
    return -(-n // 128) * 128


class _HpShim:
    """Minimal hparams surface TTSVoice uses (lengths are in samples)."""

    total_upsample = 1

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate


class OnnxFallbackEngine:
    """Architecture-agnostic voice execution: XLA-lowered ONNX graph."""

    # synthesize_batch runs rows SEQUENTIALLY (one graph execution per
    # row): lane-count padding would synthesize real extra utterances,
    # so the serving batcher must not pad
    compiled_batching = False

    def __init__(self, model: OnnxModel, sample_rate: int,
                 compile: bool = True, pad_id: int = 0):
        self.executor = OnnxExecutor(model)
        self.input_names = set(model.inputs)
        self.output_name = model.outputs[0] if model.outputs else None
        self.hp = _HpShim(sample_rate)
        self.pad_id = pad_id
        self.runner = None
        self._runner_failed = False
        if compile and os.environ.get(
                "PHOONNX_ONNX_FALLBACK_COMPILE", "1") != "0":
            from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

            self.runner = JaxGraphRunner(model)
        # padding ids is only sound when the graph masks by lengths
        self._bucket = "input_lengths" in self.input_names

    def _reseed(self, seed: int) -> None:
        """Reseed the Random*-node RNG on every execution path.

        Graph-internal noise then repeats for a repeated seed, which (a)
        makes synthesis reproducible — the reference's onnxruntime path
        cannot do this — and (b) keeps tensor shapes downstream of the
        noise-dependent duration math stable, so XLA replays cached
        compiled segments instead of recompiling."""
        self.executor.reseed(seed)
        if self.runner is not None:
            self.runner.executor.reseed(seed)

    def _run_one(self, ids: Sequence[int], noise_scale: float,
                 length_scale: float, noise_w: float,
                 speaker_id: int, lang_id: Optional[int],
                 seed: Optional[int] = None) -> np.ndarray:
        ids = list(ids)
        true_len = len(ids)
        padded = ids
        if self.runner is not None and self._bucket:
            padded = ids + [self.pad_id] * (_bucket_len(true_len) - true_len)
        feeds = {
            "input": np.asarray([padded], np.int64),
            "input_lengths": np.asarray([true_len], np.int64),
            "scales": np.asarray([noise_scale, length_scale, noise_w],
                                 np.float32),
            "sid": np.asarray([speaker_id], np.int64),
            "langid": np.asarray([lang_id or 0], np.int64),
        }
        # the reference filters feeds to the graph's declared inputs
        # (voice.py:369-372); unknown extras would be rejected
        feeds = {k: v for k, v in feeds.items() if k in self.input_names}
        missing = self.input_names - feeds.keys()
        if missing:
            # fail loudly: unfed inputs would surface as an opaque error
            # deep in an op handler, or as silent zeros for ops that
            # treat None as optional (LSTM/GRU initial state)
            raise ValueError(
                f"graph requires inputs {sorted(missing)} that this "
                "engine does not provide (expected a piper/phoonnx-style "
                "input/input_lengths/scales[/sid/langid] signature)"
            )
        outputs = ([self.output_name] if self.output_name else None)
        if seed is not None:
            self._reseed(int(seed))
        if self.runner is not None:
            try:
                if seed is not None and not self.runner.has_plan(feeds):
                    # the first call per signature is the planning pass
                    # (a pure interpreter run); discard it and return the
                    # compiled replay so every seeded call produces BIT-
                    # IDENTICAL audio regardless of call order
                    self.runner.run(feeds, outputs=outputs)
                    self._reseed(int(seed))
                audio = self.runner.run(feeds, outputs=outputs)[0]
                return np.asarray(audio, np.float32).reshape(-1)
            except Exception as exc:
                if not self._runner_failed:
                    self._runner_failed = True
                    LOG.warning(
                        "XLA lowering of the voice graph failed (%s); "
                        "degrading to the numpy interpreter", exc,
                    )
                self.runner = None
                if self._bucket and true_len != len(padded):
                    feeds["input"] = np.asarray([ids], np.int64)
        audio = self.executor.run(feeds, outputs=outputs)[0]
        audio = np.asarray(audio, np.float32)
        return audio.reshape(-1)  # [1, 1, T] / [1, T] -> [T]

    # -- VitsEngine-compatible surface --------------------------------

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
        return self._run_one(phoneme_ids, noise_scale, length_scale,
                             noise_w, speaker_id, lang_id, seed=seed)

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
        """Sequential execution; returns (padded [B, L], sample lengths).

        ``total_upsample`` is 1 for this engine, so the returned lengths
        are already sample counts (TTSVoice multiplies by upsample).
        """
        wavs = []
        for i, ids in enumerate(batch_ids):
            # per-item seed fold keeps item i's audio independent of how
            # many items precede it in the batch
            item_seed = None if seed is None else int(seed) + i
            sid = speaker_ids[i] if speaker_ids is not None else 0
            wavs.append(self._run_one(ids, noise_scale, length_scale,
                                      noise_w, sid, lang_id,
                                      seed=item_seed))
        lengths = [len(w) for w in wavs]
        out = np.zeros((len(wavs), max(lengths) if lengths else 0),
                       np.float32)
        for i, w in enumerate(wavs):
            out[i, : len(w)] = w
        return out, lengths

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
        """Yield the utterance in fixed-size sample chunks.

        Sentence-pipelined streaming: the graph is a foreign black box,
        so the decoder cannot be windowed the way the native engine's
        can (engine.py:281-322) — the utterance is synthesized
        monolithically and emitted in ``chunk_frames``-equivalent chunks.
        A frame here is the native contract's DURATION (hop 256 at
        22.05 kHz ≈ 11.6 ms) scaled to this voice's sample rate — the
        true hop of a black-box graph is unknowable, so chunk pacing is
        kept time-consistent across voices instead of assuming every
        export uses hop 256 (~1.5 s per chunk at the default 128). Across
        sentences the caller (voice.synthesize_streaming) still
        pipelines: audio for sentence N streams while N+1 has not been
        dispatched, so stream_pcm_chunks works for EVERY loadable voice
        instead of 500ing. ``overlap_frames`` is accepted for signature
        parity and unused (chunks are exact slices — the concatenated
        stream is bit-equal to :meth:`synthesize_ids` by construction).
        """
        del overlap_frames
        audio = self._run_one(phoneme_ids, noise_scale, length_scale,
                              noise_w, speaker_id, lang_id, seed=seed)
        samples_per_frame = max(1, round(self.hp.sample_rate * 256 / 22050))
        step = max(1, int(chunk_frames)) * samples_per_frame
        for off in range(0, len(audio), step):
            yield audio[off:off + step]

    def warmup(self, *args, **kwargs) -> None:
        pass  # nothing to precompile
