"""LayerNorm construction for the hot path (decoder blocks).

``LN_BF16_STATS=1`` makes every decoder-block LayerNorm compute its
mean/variance reductions in the compute dtype (bf16 in the flagship
config) instead of float32 — the "bf16-resident LN chains" experiment
from the round-3 training profile (BENCH_NOTES.md: the convert_reduce
bucket is ~10% of train-step device time; the converts bracket each LN
stat fusion). Flax upcasts reductions to f32 by default
(``force_float32_reductions``); this knob turns that off for the block
norms only — the diffusion math, evaluator models, and DeBERTa port
keep f32 stats unconditionally.

Env-gated like FAVOR_MXU_BF16 (a measured A/B knob, not a config
surface): read at TRACE time, so a rebuilt/re-jitted model picks it up
and compiled programs are unaffected by later env changes.
"""

from __future__ import annotations

import os

from flax import linen as nn


def bf16_ln_stats() -> bool:
    return os.environ.get("LN_BF16_STATS", "0") == "1"


def layer_norm(dtype, name: str, **kw) -> nn.LayerNorm:
    """A hot-path ``nn.LayerNorm``: f32 stats by default, compute-dtype
    stats under ``LN_BF16_STATS=1``."""
    return nn.LayerNorm(dtype=dtype, name=name,
                        force_float32_reductions=not bf16_ln_stats(), **kw)
