"""Text encoders.

Capability match of ``text2motion/models/text_encoder.py`` (DeBERTa-v3-large
with 8 learned prompt tokens and a LayerNorm->Dense->Dropout->GELU projection
head, trained jointly). Two implementations behind one protocol:

- :class:`HashTextEncoder` — a small, dependency-free deterministic encoder
  (hash word-pieces into an embedding table + tiny transformer) used for
  tests, CPU configs, and environments without DeBERTa weights.
- :class:`DebertaTextEncoder` (``deberta.py``) — the DeBERTa-v2/v3
  disentangled-attention architecture in JAX, with a weight converter from
  the HF torch checkpoint when one is available locally.

Tokenization is host-side (strings cannot be jitted), exactly as the
reference calls the HF tokenizer on the host (``text_encoder.py:25-28``);
the jitted graph consumes fixed-shape [B, N] token-id arrays.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motiondiffusion_moe_tpu.config import ModelConfig


class TextEncoding(NamedTuple):
    """(pooled sentence embedding, per-token embeddings) — the reference's
    ``(xf_proj, xf_out)`` pair (``text_encoder.py:42-43``)."""

    pooled: jnp.ndarray   # [B, text_latent_dim]
    tokens: jnp.ndarray   # [B, N, text_latent_dim]


def hash_tokenize(texts: List[str], max_tokens: int = 77,
                  vocab_size: int = 8192) -> np.ndarray:
    """Deterministic host-side tokenizer: lowercase whitespace split,
    FNV-1a hash into [2, vocab) buckets. 0 = pad, 1 = BOS. Empty strings
    (the CFG unconditional branch) produce BOS-only rows."""
    ids = np.zeros((len(texts), max_tokens), dtype=np.int32)
    for b, text in enumerate(texts):
        ids[b, 0] = 1
        for i, word in enumerate(text.lower().split()[: max_tokens - 1]):
            h = np.uint64(14695981039346656037)
            for ch in word.encode("utf-8"):
                h = np.uint64((int(h) ^ ch) * 1099511628211 % (1 << 64))
            ids[b, i + 1] = 2 + int(h) % (vocab_size - 2)
    return ids


class HashTextEncoder(nn.Module):
    """Hash-embedding text encoder with the reference's head architecture:
    learned prompt tokens prepended, projection LN->Dense->Dropout->GELU,
    mean-pooled sentence embedding (``text_encoder.py:13-43``)."""

    output_dim: int
    hidden_size: int = 256
    vocab_size: int = 8192
    num_prompt_tokens: int = 8
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray,
                 deterministic: bool = True) -> TextEncoding:
        B, N = ids.shape
        h = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                     name="embed")(ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (N, self.hidden_size))
        h = h + pos[None, :, :].astype(self.dtype)

        mask = (ids != 0)
        attn_mask = mask[:, None, None, :]  # [B, 1, 1, N]
        for i in range(self.num_layers):
            a = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(h)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=deterministic,
                name=f"attn_{i}")(a, a, mask=attn_mask)
            h = h + a
            f = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(h)
            f = nn.Dense(self.hidden_size * 4, dtype=self.dtype,
                         name=f"mlp_{i}_0")(f)
            f = nn.gelu(f)
            f = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"mlp_{i}_1")(f)
            h = h + f

        prompts = self.param("prompt_tokens", nn.initializers.normal(1.0),
                             (1, self.num_prompt_tokens, self.hidden_size))
        h = jnp.concatenate(
            [jnp.broadcast_to(prompts, (B,) + prompts.shape[1:]).astype(self.dtype),
             h], axis=1)

        # projection head (text_encoder.py:13-18)
        p = nn.LayerNorm(dtype=self.dtype, name="proj_norm")(h)
        p = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_dense")(p)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        p = nn.gelu(p)

        pooled = jnp.mean(p, axis=1)  # text_encoder.py:42
        return TextEncoding(pooled=pooled, tokens=p)


TokenizeFn = Callable[[List[str]], np.ndarray]


def get_text_encoder(cfg: ModelConfig) -> Tuple[TokenizeFn, nn.Module]:
    """(host tokenizer, flax encoder module) for the configured backend."""
    if cfg.text_encoder == "hash":
        tokenize = lambda texts: hash_tokenize(texts, cfg.text_max_tokens)
        module = HashTextEncoder(
            output_dim=cfg.text_latent_dim,
            num_prompt_tokens=cfg.text_num_prompt_tokens,
            dropout=cfg.dropout)
        return tokenize, module
    if cfg.text_encoder.startswith("deberta"):
        from motiondiffusion_moe_tpu.models.deberta import get_deberta_encoder
        return get_deberta_encoder(cfg)
    raise ValueError(f"unknown text encoder: {cfg.text_encoder}")
