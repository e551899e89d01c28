"""DeBERTa-v2/v3 encoder in JAX (disentangled attention).

Capability match of the reference's text backbone: ``EnhancedTextEncoder``
wraps ``microsoft/deberta-v3-large`` via HF AutoModel
(``text2motion/models/text_encoder.py:6-43``) with 8 learned prompt tokens
prepended to the hidden states and a LayerNorm->Dense->Dropout->GELU
projection head, trained jointly.

This is a from-scratch flax implementation of the DeBERTa-v2 architecture
(shared by v3): relative-position disentangled attention with
content-to-position (c2p) and position-to-content (p2c) terms over a
log-bucketed relative-position embedding table. Weight conversion from the
HF torch checkpoint is provided (:func:`convert_hf_deberta_checkpoint`);
in environments without the weights (zero egress) the encoder runs with
random init — the architecture, shapes, and conversion path are complete.

Tokenization: DeBERTa-v3 uses a SentencePiece tokenizer. When
``transformers`` can load it locally we use it; otherwise
``hash_tokenize`` stands in so the pipeline stays runnable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motiondiffusion_moe_tpu.config import ModelConfig
from motiondiffusion_moe_tpu.models.text_encoder import TextEncoding, hash_tokenize


@dataclass(frozen=True)
class DebertaConfig:
    """deberta-v3-large dimensions (HF config defaults)."""

    vocab_size: int = 128100
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    position_buckets: int = 256
    layer_norm_eps: float = 1e-7
    dropout: float = 0.1
    # v3 checkpoints (incl. deberta-v3-large) share query/key projections
    # for the position embeddings (HF ``share_att_key``); v2-style separate
    # pos_key_proj/pos_query_proj when False.
    share_att_key: bool = True

    @staticmethod
    def large() -> "DebertaConfig":
        return DebertaConfig()

    @staticmethod
    def tiny() -> "DebertaConfig":
        """For tests."""
        return DebertaConfig(vocab_size=256, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=64,
                             max_position_embeddings=64, position_buckets=16)


def make_log_bucket_position(relative_pos: jnp.ndarray, bucket_size: int,
                             max_position: int) -> jnp.ndarray:
    """HF's log-bucketed relative positions
    (transformers deberta_v2 ``make_log_bucket_position``)."""
    sign = jnp.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = jnp.where(
        (relative_pos < mid) & (relative_pos > -mid),
        mid - 1,
        jnp.abs(relative_pos))
    log_pos = (
        jnp.ceil(jnp.log(abs_pos / mid)
                 / math.log((max_position - 1) / mid) * (mid - 1)) + mid)
    return jnp.where((relative_pos < mid) & (relative_pos > -mid),
                     relative_pos,
                     (log_pos * sign).astype(relative_pos.dtype))


def build_relative_position(query_len: int, key_len: int, bucket_size: int,
                            max_position: int) -> jnp.ndarray:
    """[1, Q, K] bucketed relative position ids."""
    q_ids = jnp.arange(query_len)
    k_ids = jnp.arange(key_len)
    rel = q_ids[:, None] - k_ids[None, :]
    rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel[None].astype(jnp.int32)


class DisentangledSelfAttention(nn.Module):
    """DeBERTa-v2 disentangled attention: content-content + c2p + p2c."""

    cfg: DebertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, attn_mask: jnp.ndarray,
                 rel_embeddings: jnp.ndarray, rel_pos: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        B, T, _ = hidden.shape
        H = c.num_attention_heads
        head_dim = c.hidden_size // H

        def heads(x):
            return x.reshape(B, T, H, head_dim).transpose(0, 2, 1, 3)

        q_dense = nn.Dense(c.hidden_size, dtype=self.dtype, name="query_proj")
        k_dense = nn.Dense(c.hidden_size, dtype=self.dtype, name="key_proj")
        q = heads(q_dense(hidden))
        k = heads(k_dense(hidden))
        v = heads(nn.Dense(c.hidden_size, dtype=self.dtype,
                           name="value_proj")(hidden))

        # 3 attention factors: content-content, c2p, p2c
        scale = 1.0 / math.sqrt(head_dim * 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        att_span = c.position_buckets
        # rel_embeddings: [2*span, hidden]. v3 (share_att_key) reuses the
        # content q/k projections for positions; v2 has dedicated ones.
        if c.share_att_key:
            pos_key = k_dense(rel_embeddings)
            pos_query = q_dense(rel_embeddings)
        else:
            pos_key = nn.Dense(c.hidden_size, dtype=self.dtype,
                               name="pos_key_proj")(rel_embeddings)
            pos_query = nn.Dense(c.hidden_size, dtype=self.dtype,
                                 name="pos_query_proj")(rel_embeddings)
        pos_key = pos_key.reshape(2 * att_span, H, head_dim).transpose(1, 0, 2)
        pos_query = pos_query.reshape(2 * att_span, H, head_dim).transpose(1, 0, 2)

        # c2p: query content x key position
        c2p = jnp.einsum("bhqd,hkd->bhqk", q, pos_key) * scale  # k over 2*span
        c2p_idx = jnp.clip(rel_pos + att_span, 0, 2 * att_span - 1)  # [1,Q,K]
        c2p = jnp.take_along_axis(
            c2p, jnp.broadcast_to(c2p_idx[:, None], (B, H, T, T)), axis=-1)
        scores = scores + c2p

        # p2c: key content x query position (transposed gather)
        p2c = jnp.einsum("bhkd,hqd->bhkq", k, pos_query) * scale
        p2c_idx = jnp.clip(-rel_pos + att_span, 0, 2 * att_span - 1)
        p2c = jnp.take_along_axis(
            p2c, jnp.broadcast_to(p2c_idx[:, None], (B, H, T, T)), axis=-1)
        scores = scores + p2c.transpose(0, 1, 3, 2)

        scores = scores + (1.0 - attn_mask[:, None, None, :]) * -1e9
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        probs = nn.Dropout(c.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, c.hidden_size)
        return out


class DebertaLayer(nn.Module):
    cfg: DebertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_mask, rel_embeddings, rel_pos,
                 deterministic: bool = True):
        c = self.cfg
        attn = DisentangledSelfAttention(cfg=c, dtype=self.dtype,
                                         name="attention")(
            hidden, attn_mask, rel_embeddings, rel_pos, deterministic)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype,
                        name="attention_output")(attn)
        attn = nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                              name="attention_norm")(hidden + attn)

        inter = nn.Dense(c.intermediate_size, dtype=self.dtype,
                         name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(c.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(hidden + out)


class DebertaEncoder(nn.Module):
    """Embeddings + N disentangled-attention layers."""

    cfg: DebertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attn_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        T = input_ids.shape[1]
        h = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_norm")(h)
        # HF order: LayerNorm -> mask multiply -> dropout
        h = h * attn_mask[..., None].astype(h.dtype)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)

        rel_embeddings = self.param(
            "rel_embeddings", nn.initializers.normal(0.02),
            (2 * c.position_buckets, c.hidden_size)).astype(self.dtype)
        rel_embeddings = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype,
            name="rel_embeddings_norm")(rel_embeddings)
        rel_pos = build_relative_position(T, T, c.position_buckets,
                                          c.max_position_embeddings)

        for i in range(c.num_hidden_layers):
            h = DebertaLayer(cfg=c, dtype=self.dtype, name=f"layer_{i}")(
                h, attn_mask, rel_embeddings, rel_pos, deterministic)
        return h


class DebertaTextEncoder(nn.Module):
    """The reference's EnhancedTextEncoder head on a Deberta backbone
    (``text_encoder.py:6-43``): 8 prompt tokens prepended to the hidden
    states, LN->Dense->Dropout->GELU projection, mean-pooled sentence
    embedding."""

    output_dim: int
    cfg: DebertaConfig
    num_prompt_tokens: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray,
                 deterministic: bool = True) -> TextEncoding:
        B = ids.shape[0]
        attn_mask = (ids != 0).astype(jnp.float32)
        hidden = DebertaEncoder(cfg=self.cfg, dtype=self.dtype,
                                name="bert")(ids, attn_mask, deterministic)

        prompts = self.param("prompt_tokens", nn.initializers.normal(1.0),
                             (1, self.num_prompt_tokens, self.cfg.hidden_size))
        hidden = jnp.concatenate(
            [jnp.broadcast_to(prompts,
                              (B,) + prompts.shape[1:]).astype(self.dtype),
             hidden], axis=1)

        p = nn.LayerNorm(dtype=self.dtype, name="proj_norm")(hidden)
        p = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_dense")(p)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        p = nn.gelu(p)
        pooled = jnp.mean(p, axis=1)
        return TextEncoding(pooled=pooled, tokens=p)


# ---------------------------------------------------------------------------
# tokenizer + weight conversion
# ---------------------------------------------------------------------------

def get_deberta_tokenizer(max_tokens: int = 77, vocab_size: int = 128100
                          ) -> Callable[[List[str]], np.ndarray]:
    """HF SentencePiece tokenizer when locally available, hash fallback
    (hashed into the ENCODER's vocab so small test configs never see
    out-of-range ids)."""
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained("microsoft/deberta-v3-large",
                                            local_files_only=True)
        if getattr(tok, "vocab_size", 0) > vocab_size:
            # a small-vocab test encoder (e.g. deberta-tiny) cannot take
            # the real tokenizer's ids — the embedding gather would
            # silently clamp them (JAX indexing) into garbage features
            raise ValueError("tokenizer vocab exceeds encoder vocab")

        def tokenize(texts: List[str]) -> np.ndarray:
            out = tok(texts, padding="max_length", truncation=True,
                      max_length=max_tokens, return_tensors="np")
            return out["input_ids"].astype(np.int32)

        return tokenize
    except Exception:
        return lambda texts: hash_tokenize(texts, max_tokens,
                                           vocab_size=min(vocab_size, 8192))


def convert_hf_deberta_checkpoint(state_dict: Dict[str, Any],
                                  cfg: DebertaConfig) -> Dict[str, Any]:
    """Map an HF torch ``deberta-v2`` state_dict onto the flax param tree of
    :class:`DebertaEncoder` (the ``bert`` subtree)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}

    def dense(name):
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    params: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "embeddings_norm": ln("embeddings.LayerNorm"),
        "rel_embeddings": sd["encoder.rel_embeddings.weight"],
        "rel_embeddings_norm": ln("encoder.LayerNorm"),
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        attn = {
            "query_proj": dense(f"{pre}.attention.self.query_proj"),
            "key_proj": dense(f"{pre}.attention.self.key_proj"),
            "value_proj": dense(f"{pre}.attention.self.value_proj"),
        }
        if not cfg.share_att_key:
            # v2-style checkpoints carry dedicated position projections;
            # v3 (share_att_key) reuses query/key and has no such keys.
            attn["pos_key_proj"] = dense(f"{pre}.attention.self.pos_key_proj")
            attn["pos_query_proj"] = dense(
                f"{pre}.attention.self.pos_query_proj")
        params[f"layer_{i}"] = {
            "attention": attn,
            "attention_output": dense(f"{pre}.attention.output.dense"),
            "attention_norm": ln(f"{pre}.attention.output.LayerNorm"),
            "intermediate": dense(f"{pre}.intermediate.dense"),
            "output": dense(f"{pre}.output.dense"),
            "output_norm": ln(f"{pre}.output.LayerNorm"),
        }
    return params


def get_deberta_encoder(cfg: ModelConfig):
    """(tokenizer, module) pair for ``text_encoder='deberta-v3-large'``."""
    dcfg = (DebertaConfig.large() if "large" in cfg.text_encoder
            else DebertaConfig.tiny())
    module = DebertaTextEncoder(output_dim=cfg.text_latent_dim, cfg=dcfg,
                                num_prompt_tokens=cfg.text_num_prompt_tokens,
                                dropout=cfg.dropout)
    return get_deberta_tokenizer(cfg.text_max_tokens, dcfg.vocab_size), module


# ---------------------------------------------------------------------------
# pretrained-weight grafting (the reference's ``AutoModel.from_pretrained``
# path, ``text_encoder.py:9-11`` — trained jointly from pretrained init)
# ---------------------------------------------------------------------------

def load_hf_deberta_state_dict(path: str) -> Dict[str, Any]:
    """Load a LOCAL HF DeBERTa torch state_dict.

    ``path``: a directory containing ``pytorch_model.bin`` (the HF save
    layout) or a direct ``.bin``/``.pt`` file. Keys with a leading
    ``deberta.`` prefix (full-model checkpoints) are stripped to the bare
    encoder layout the converter expects.
    """
    import os

    import torch

    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.bin", "model.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin / model.bin / model.pt in {path}")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if any(k.startswith("deberta.") for k in sd):
        sd = {k[len("deberta."):]: v for k, v in sd.items()
              if k.startswith("deberta.")}
    return sd


def graft_pretrained_text_encoder(variables: Dict[str, Any],
                                  cfg: ModelConfig) -> Dict[str, Any]:
    """Graft pretrained DeBERTa weights into a :class:`MotionTransformer`
    variables tree (the ``params/text_encoder/bert`` subtree).

    Returns the tree unchanged for non-DeBERTa configs. With a DeBERTa
    config and no ``text_encoder_ckpt`` it WARNS loudly and keeps random
    init (the zero-egress fallback) — never silently.
    """
    import warnings

    if not cfg.text_encoder.startswith("deberta"):
        return variables
    if not cfg.text_encoder_ckpt:
        warnings.warn(
            f"text_encoder='{cfg.text_encoder}' with no text_encoder_ckpt: "
            "the DeBERTa backbone is RANDOM-INIT. Pass --deberta_ckpt (a "
            "local HF checkpoint dir) to train from pretrained weights as "
            "the reference does.", stacklevel=2)
        return variables

    import flax

    dcfg = (DebertaConfig.large() if "large" in cfg.text_encoder
            else DebertaConfig.tiny())
    sd = load_hf_deberta_state_dict(cfg.text_encoder_ckpt)
    bert = convert_hf_deberta_checkpoint(sd, dcfg)

    params = variables["params"]
    if "text_encoder" not in params or "bert" not in params["text_encoder"]:
        raise ValueError(
            "variables tree has no params/text_encoder/bert subtree — is "
            "the model built with a DeBERTa text encoder?")
    old = flax.traverse_util.flatten_dict(params["text_encoder"]["bert"])
    new = flax.traverse_util.flatten_dict(bert)
    if set(old) != set(new):
        missing = set(old) - set(new)
        extra = set(new) - set(old)
        raise ValueError(
            f"checkpoint/model tree mismatch: missing {sorted(missing)[:5]} "
            f"extra {sorted(extra)[:5]}")
    for k in old:
        a, b = old[k].shape, np.asarray(new[k]).shape
        if a != b:
            raise ValueError(f"shape mismatch at {'/'.join(k)}: {a} vs {b}")
    # device_put (data-plane only, no compile) — an eager jnp.asarray per
    # leaf would pay a program round-trip each on the remote-chip tunnel
    graft = {k: jax.device_put(np.asarray(v, dtype=old[k].dtype))
             for k, v in new.items()}
    text_enc = dict(params["text_encoder"])
    text_enc["bert"] = flax.traverse_util.unflatten_dict(graft)
    return flax.core.copy(variables, {
        "params": {**params, "text_encoder": text_enc}})
