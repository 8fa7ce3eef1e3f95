"""ByT5/T5 encoder-decoder for neural G2P, running on TPU.

The reference executes the ByT5 G2P ONNX model with onnxruntime, re-running
the full decoder for every generated token (phoonnx/phonemizers/mul.py:
201-230 — up to 512 session.run calls per chunk). This implementation runs
the same checkpoints natively: the encoder is one fused XLA program and the
decoder is a jitted `lax.while_loop` greedy decode with KV caching, so each
step costs one incremental layer pass instead of a full re-encode.

Weights import by name from the HF/torch parameter naming preserved in ONNX
exports (``encoder.block.N.layer.0.SelfAttention.q.weight``...); the
architecture config (layers, d_model, heads, FFN type) is inferred from
tensor shapes.
"""

import logging
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG = logging.getLogger(__name__)

Array = jax.Array


@dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_heads: int
    num_encoder_layers: int
    num_decoder_layers: int
    relative_buckets: int = 32
    relative_max_distance: int = 128
    gated_ffn: bool = True
    tie_word_embeddings: bool = False
    layer_norm_eps: float = 1e-6
    pad_id: int = 0
    eos_id: int = 1


# ---------------------------------------------------------------------------
# Weight import
# ---------------------------------------------------------------------------


def config_from_flat(named: Mapping[str, np.ndarray]) -> T5Config:
    shapes = {k: tuple(np.asarray(v).shape) for k, v in named.items()}

    def find(key):
        return shapes.get(key)

    vocab, d_model = find("shared.weight")
    q = find("encoder.block.0.layer.0.SelfAttention.q.weight")
    inner = q[0]
    rel = find(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    )
    relative_buckets, num_heads = rel
    d_kv = inner // num_heads
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in shapes
    ff_key = ("encoder.block.0.layer.1.DenseReluDense.wi_0.weight"
              if gated else "encoder.block.0.layer.1.DenseReluDense.wi.weight")
    d_ff = find(ff_key)[0]

    def count_layers(prefix):
        n = 0
        while f"{prefix}.block.{n}.layer.0.SelfAttention.q.weight" in shapes:
            n += 1
        return n

    return T5Config(
        vocab_size=vocab,
        d_model=d_model,
        d_kv=d_kv,
        d_ff=d_ff,
        num_heads=num_heads,
        num_encoder_layers=count_layers("encoder"),
        num_decoder_layers=count_layers("decoder"),
        relative_buckets=relative_buckets,
        gated_ffn=gated,
        tie_word_embeddings="lm_head.weight" not in shapes,
    )


def params_from_flat(named: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Nest HF-named arrays into a params tree (kept in HF layout:
    linear weights are [out, in] and applied as x @ W^T)."""
    tree: Dict[str, Any] = {}
    for name, value in named.items():
        parts = name.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))
    return tree


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def _rms_norm(weight: Array, x: Array, eps: float) -> Array:
    variance = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                        keepdims=True)
    return (x * jax.lax.rsqrt(variance + eps)).astype(x.dtype) * weight


def _linear(p: Dict[str, Array], x: Array) -> Array:
    return x @ p["weight"].T


def _relative_bucket(relative_position: Array, bidirectional: bool,
                     num_buckets: int, max_distance: int) -> Array:
    """T5 relative position bucketing (log-spaced beyond max_exact)."""
    bucket = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        bucket = bucket + (relative_position > 0).astype(jnp.int32) * num_buckets
        position = jnp.abs(relative_position)
    else:
        position = -jnp.minimum(relative_position, 0)

    max_exact = num_buckets // 2
    is_small = position < max_exact
    large = max_exact + (
        jnp.log(position.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return bucket + jnp.where(is_small, position, large)


def _position_bias(rel_table: Array, q_len: int, k_len: int,
                   bidirectional: bool, cfg: T5Config,
                   q_offset: Array = 0) -> Array:
    """[1, H, q_len, k_len] additive attention bias."""
    context = jnp.arange(q_len)[:, None] + q_offset
    memory = jnp.arange(k_len)[None, :]
    relative = memory - context
    buckets = _relative_bucket(
        relative, bidirectional, cfg.relative_buckets,
        cfg.relative_max_distance,
    )
    bias = jnp.take(rel_table, buckets, axis=0)  # [q, k, H]
    return bias.transpose(2, 0, 1)[None]


def _attention(p, x: Array, kv: Array, cfg: T5Config,
               bias: Optional[Array] = None,
               mask: Optional[Array] = None) -> Array:
    b, q_len, _ = x.shape
    k_len = kv.shape[1]
    heads, d_kv = cfg.num_heads, cfg.d_kv

    q = _linear(p["q"], x).reshape(b, q_len, heads, d_kv).transpose(0, 2, 1, 3)
    k = _linear(p["k"], kv).reshape(b, k_len, heads, d_kv).transpose(0, 2, 1, 3)
    v = _linear(p["v"], kv).reshape(b, k_len, heads, d_kv).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(b, q_len, heads * d_kv)
    return _linear(p["o"], out)


def _ffn(p, x: Array, cfg: T5Config) -> Array:
    if cfg.gated_ffn:
        # HF "gated-gelu" is the tanh-approximate (gelu_new) variant
        gate = jax.nn.gelu(_linear(p["wi_0"], x), approximate=True)
        hidden = gate * _linear(p["wi_1"], x)
    else:
        hidden = jax.nn.relu(_linear(p["wi"], x))
    return _linear(p["wo"], hidden)


def encode(params, cfg: T5Config, input_ids: Array,
           attention_mask: Array) -> Array:
    """input_ids [B, T] -> encoder hidden states [B, T, D]."""
    enc = params["encoder"]
    x = jnp.take(params["shared"]["weight"], input_ids, axis=0)
    t = input_ids.shape[1]
    rel_table = enc["block"]["0"]["layer"]["0"]["SelfAttention"][
        "relative_attention_bias"]["weight"]
    bias = _position_bias(rel_table, t, t, True, cfg)
    mask = attention_mask[:, None, None, :] > 0

    for i in range(cfg.num_encoder_layers):
        block = enc["block"][str(i)]["layer"]
        attn = block["0"]
        h = _rms_norm(attn["layer_norm"]["weight"], x, cfg.layer_norm_eps)
        x = x + _attention(attn["SelfAttention"], h, h, cfg, bias=bias,
                           mask=mask)
        ff = block["1"]
        h = _rms_norm(ff["layer_norm"]["weight"], x, cfg.layer_norm_eps)
        x = x + _ffn(ff["DenseReluDense"], h, cfg)
    return _rms_norm(enc["final_layer_norm"]["weight"], x, cfg.layer_norm_eps)


def _decoder_logits_full(params, cfg: T5Config, decoder_ids: Array,
                         encoder_out: Array, encoder_mask: Array) -> Array:
    """Full (non-incremental) decoder pass -> logits [B, T_dec, V]."""
    dec = params["decoder"]
    x = jnp.take(params["shared"]["weight"], decoder_ids, axis=0)
    t = decoder_ids.shape[1]
    rel_table = dec["block"]["0"]["layer"]["0"]["SelfAttention"][
        "relative_attention_bias"]["weight"]
    self_bias = _position_bias(rel_table, t, t, False, cfg)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    cross_mask = encoder_mask[:, None, None, :] > 0

    for i in range(cfg.num_decoder_layers):
        block = dec["block"][str(i)]["layer"]
        attn = block["0"]
        h = _rms_norm(attn["layer_norm"]["weight"], x, cfg.layer_norm_eps)
        x = x + _attention(attn["SelfAttention"], h, h, cfg, bias=self_bias,
                           mask=causal)
        cross = block["1"]
        h = _rms_norm(cross["layer_norm"]["weight"], x, cfg.layer_norm_eps)
        x = x + _attention(cross["EncDecAttention"], h, encoder_out, cfg,
                           mask=cross_mask)
        ff = block["2"]
        h = _rms_norm(ff["layer_norm"]["weight"], x, cfg.layer_norm_eps)
        x = x + _ffn(ff["DenseReluDense"], h, cfg)

    x = _rms_norm(dec["final_layer_norm"]["weight"], x, cfg.layer_norm_eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
        return x @ params["shared"]["weight"].T
    return x @ params["lm_head"]["weight"].T


def greedy_decode(params, cfg: T5Config, input_ids: Array,
                  attention_mask: Array, max_length: int = 512
                  ) -> Tuple[Array, Array]:
    """KV-cached greedy decode; returns (tokens [B, max_length], lengths).

    Decoder starts from pad (0); generation stops at eos (1), matching the
    reference's loop (mul.py:181-233). ``lengths[row]`` counts the
    generated tokens before the EOS marker, so ``tokens[row, :length]``
    is the pre-EOS sequence.
    """
    b = input_ids.shape[0]
    encoder_out = encode(params, cfg, input_ids, attention_mask)

    dec = params["decoder"]
    heads, d_kv = cfg.num_heads, cfg.d_kv
    n_layers = cfg.num_decoder_layers
    rel_table = dec["block"]["0"]["layer"]["0"]["SelfAttention"][
        "relative_attention_bias"]["weight"]

    # Precompute cross-attention K/V once per layer.
    cross_kv = []
    for i in range(n_layers):
        attn = dec["block"][str(i)]["layer"]["1"]["EncDecAttention"]
        k_len = encoder_out.shape[1]
        k = _linear(attn["k"], encoder_out).reshape(
            b, k_len, heads, d_kv).transpose(0, 2, 1, 3)
        v = _linear(attn["v"], encoder_out).reshape(
            b, k_len, heads, d_kv).transpose(0, 2, 1, 3)
        cross_kv.append((k, v))
    cross_mask = attention_mask[:, None, None, :] > 0

    # KV cache in the parameter dtype (bf16 halves per-step cache reads)
    cache_dtype = params["shared"]["weight"].dtype
    self_k = jnp.zeros((n_layers, b, heads, max_length, d_kv), cache_dtype)
    self_v = jnp.zeros_like(self_k)
    tokens = jnp.zeros((b, max_length + 1), jnp.int32)  # slot 0 = start pad
    finished = jnp.zeros((b,), bool)
    lengths = jnp.zeros((b,), jnp.int32)

    def step_fn(carry):
        tokens, self_k, self_v, finished, lengths, pos = carry
        current = jnp.take_along_axis(tokens, pos[None, None], axis=1)[:, 0]
        x = jnp.take(params["shared"]["weight"], current, axis=0)[:, None, :]

        # layer-invariant: the decoder shares ONE relative-position table
        # and the valid-key mask depends only on pos — hoist out of the
        # layer loop (was rebuilt n_layers times per decode step)
        bias = _position_bias(rel_table, 1, max_length, False, cfg,
                              q_offset=pos)
        valid = (jnp.arange(max_length) <= pos)[None, None, None, :]

        new_k, new_v = self_k, self_v
        for i in range(n_layers):
            block = dec["block"][str(i)]["layer"]
            attn = block["0"]
            h = _rms_norm(attn["layer_norm"]["weight"], x, cfg.layer_norm_eps)
            sa = attn["SelfAttention"]
            q = _linear(sa["q"], h).reshape(b, 1, heads, d_kv).transpose(
                0, 2, 1, 3)
            k_step = _linear(sa["k"], h).reshape(b, 1, heads, d_kv).transpose(
                0, 2, 1, 3)
            v_step = _linear(sa["v"], h).reshape(b, 1, heads, d_kv).transpose(
                0, 2, 1, 3)
            new_k = new_k.at[i, :, :, pos].set(k_step[:, :, 0])
            new_v = new_v.at[i, :, :, pos].set(v_step[:, :, 0])

            scores = jnp.einsum("bhqd,bhkd->bhqk", q, new_k[i],
                                preferred_element_type=jnp.float32)
            scores = jnp.where(valid, scores + bias, -1e9)
            weights = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, new_v[i],
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(b, 1, heads * d_kv)
            x = x + _linear(sa["o"], out)

            cross = block["1"]
            h = _rms_norm(cross["layer_norm"]["weight"], x,
                          cfg.layer_norm_eps)
            ca = cross["EncDecAttention"]
            qc = _linear(ca["q"], h).reshape(b, 1, heads, d_kv).transpose(
                0, 2, 1, 3)
            ck, cv = cross_kv[i]
            scores = jnp.einsum("bhqd,bhkd->bhqk", qc, ck,
                                preferred_element_type=jnp.float32)
            scores = jnp.where(cross_mask, scores, -1e9)
            weights = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, cv,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(b, 1, heads * d_kv)
            x = x + _linear(ca["o"], out)

            ff = block["2"]
            h = _rms_norm(ff["layer_norm"]["weight"], x, cfg.layer_norm_eps)
            # keep activations in the parameter dtype (the f32-accumulated
            # attention outputs would otherwise upcast every later layer)
            x = (x + _ffn(ff["DenseReluDense"], h, cfg)).astype(cache_dtype)

        x = _rms_norm(dec["final_layer_norm"]["weight"], x,
                      cfg.layer_norm_eps)
        if cfg.tie_word_embeddings:
            logits = jnp.dot(x * cfg.d_model ** -0.5,
                             params["shared"]["weight"].T,
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(x, params["lm_head"]["weight"].T,
                             preferred_element_type=jnp.float32)

        next_token = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        next_token = jnp.where(finished, cfg.pad_id, next_token)
        tokens = tokens.at[:, pos + 1].set(next_token)
        newly_finished = finished | (next_token == cfg.eos_id)
        # lengths count generated tokens BEFORE the EOS marker
        lengths = jnp.where(
            finished, lengths,
            jnp.where(next_token == cfg.eos_id, pos, pos + 1),
        )
        return tokens, new_k, new_v, newly_finished, lengths, pos + 1

    def cond_fn(carry):
        _, _, _, finished, _, pos = carry
        return (pos < max_length) & ~jnp.all(finished)

    carry = (tokens, self_k, self_v, finished, lengths, jnp.int32(0))
    tokens, _, _, finished, lengths, _ = jax.lax.while_loop(
        cond_fn, step_fn, carry
    )
    return tokens[:, 1:], lengths


class ByT5Engine:
    """Loaded ByT5 G2P model with a compiled greedy decoder.

    dtype: "bfloat16" halves the per-step HBM traffic (autoregressive
    decode is weight/KV-bandwidth bound); attention scores and logits
    still accumulate in f32 before the argmax.

    max_length_factor: every decode step attends over the FULL KV
    window, so the per-step cost scales with the step budget, not the
    tokens actually generated. The budget is therefore bucketed to
    ``max(64, factor * input_bucket)`` (capped at ``max_length``) —
    G2P outputs are byte strings a small multiple of their input's
    length, so factor 4 is generous (the reference always runs a
    512-slot decoder, mul.py:201). None restores the flat budget.
    """

    def __init__(self, params, cfg: T5Config, max_length: int = 512,
                 input_buckets=(32, 64, 128, 256, 512),
                 dtype: str = "float32",
                 max_length_factor: Optional[int] = 4):
        if dtype == "bfloat16":
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                else jnp.asarray(a),
                params,
            )
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.max_length = max_length
        self.input_buckets = input_buckets
        self.max_length_factor = max_length_factor
        self._decode_cache = {}

    def _decode_for(self, input_bucket: int):
        """Jitted decode program with a bucketed step budget."""
        if self.max_length_factor is None:
            dec_len = self.max_length
        else:
            want = max(64, self.max_length_factor * input_bucket)
            dec_len = 64
            while dec_len < want:
                dec_len *= 2
            dec_len = min(dec_len, self.max_length)
        if dec_len not in self._decode_cache:
            self._decode_cache[dec_len] = jax.jit(
                partial(greedy_decode, cfg=self.cfg, max_length=dec_len)
            )
        return self._decode_cache[dec_len]

    @classmethod
    def from_onnx(cls, model_path: str, **kw) -> "ByT5Engine":
        from phoonnx_tpu.onnx.reader import read_onnx

        model = read_onnx(model_path)
        if not model.initializers:
            raise FileNotFoundError(
                f"no initializers found in {model_path}"
            )
        named = model.initializers
        cfg = config_from_flat(named)
        return cls(params_from_flat(named), cfg, **kw)

    @classmethod
    def from_flat(cls, named: Mapping[str, np.ndarray], **kw) -> "ByT5Engine":
        return cls(params_from_flat(named), config_from_flat(named), **kw)

    def greedy_decode(self, input_ids: List[int]) -> List[int]:
        """One utterance byte-id list -> generated token ids (pre-EOS)."""
        return self.greedy_decode_batch([input_ids])[0]

    def greedy_decode_batch(self, batch_ids: List[List[int]]
                            ) -> List[List[int]]:
        """Batched greedy decode over padded inputs.

        The per-row ``finished`` handling in the decode loop keeps short
        sequences padded after their EOS, so e.g. Charsiu's word-by-word
        phonemization runs as ONE device program instead of one decode per
        word (the reference loops a full onnxruntime decoder per word,
        mul.py:286-288).
        """
        length = max(len(ids) for ids in batch_ids)
        bucket = next(
            (b for b in self.input_buckets if length <= b),
            self.input_buckets[-1],
        )
        if length > bucket:
            LOG.warning(
                "ByT5 input of %d byte ids exceeds the largest input "
                "bucket (%d); the tail is truncated — chunk the text "
                "upstream for full coverage", length, bucket,
            )
        batch = len(batch_ids)
        # pad the batch dimension to a power of two so Charsiu-style
        # word batches (one per sentence, any size) hit a handful of
        # compiled programs instead of one per word count; the padding
        # repeats row 0 so the extra lanes terminate like real data
        lanes = 1
        while lanes < batch:
            lanes *= 2
        ids = np.zeros((lanes, bucket), np.int32)
        mask = np.zeros((lanes, bucket), np.int32)
        for row in range(lanes):
            utt = batch_ids[row] if row < batch else batch_ids[0]
            take = min(len(utt), bucket)
            ids[row, :take] = utt[:take]
            mask[row, :take] = 1
        tokens, lengths = self._decode_for(bucket)(
            self.params, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        )
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        return [
            [int(t) for t in tokens[row][: int(lengths[row])]]
            for row in range(batch)
        ]
