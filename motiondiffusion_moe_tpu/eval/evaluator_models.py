"""Contrastive evaluator models (the FID / R-precision backbone) in JAX.

Capability match of ``text2motion/datasets1/evaluator_models.py`` (Guo et
al. text-to-motion protocol): Conv1d movement encoder (2x stride-2 -> /4
temporal), bidirectional-GRU text & motion encoders into a 512-d
co-embedding space, and the BiGRU motion-length estimator.

TPU-first design notes:
- torch's ``pack_padded_sequence`` + GRU semantics (``evaluator_models.py:
  335-386``) — "final hidden = hidden after each sample's last valid step"
  — are reproduced with a masked ``lax.scan``: the carry freezes once
  t >= length. The backward direction scans the time-reversed sequence with
  a per-sample roll so each row starts at its own last valid frame.
- GRU cell math follows torch's gate layout (r, z, n with the
  r*(W_hn h + b_hn) form), so released ``finest.tar`` checkpoints convert
  weight-for-weight via :func:`convert_torch_evaluator_checkpoint`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def gru_cell_step(params: Dict[str, jnp.ndarray], h: jnp.ndarray,
                  x: jnp.ndarray) -> jnp.ndarray:
    """One GRU step with torch's parameterization.

    ``params``: w_ih [3H, In], w_hh [3H, H], b_ih [3H], b_hh [3H]
    (gate order r, z, n — torch.nn.GRU layout). Pure function so it can run
    inside lax.scan (flax submodule calls inside scan bodies leak tracers).
    """
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


class MaskedBiGRU(nn.Module):
    """Bidirectional GRU over padded [B, T, D] with per-sample lengths.

    Returns (seq [B, T, 2H], last [B, 2H]) where ``last`` matches torch's
    packed-sequence final hidden states (fwd at t=len-1, bwd at t=0).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 h0: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, Din = x.shape
        H = self.hidden_size

        def gru_params(direction: str) -> Dict[str, jnp.ndarray]:
            # params created OUTSIDE the scan body; gate order r,z,n
            return {
                "w_ih": self.param(f"{direction}_w_ih",
                                   nn.initializers.lecun_normal(),
                                   (3 * H, Din)),
                "w_hh": self.param(f"{direction}_w_hh",
                                   nn.initializers.lecun_normal(),
                                   (3 * H, H)),
                "b_ih": self.param(f"{direction}_b_ih",
                                   nn.initializers.zeros, (3 * H,)),
                "b_hh": self.param(f"{direction}_b_hh",
                                   nn.initializers.zeros, (3 * H,)),
            }

        fwd_p = gru_params("fwd")
        bwd_p = gru_params("bwd")

        if h0 is None:
            h0 = jnp.zeros((2, B, H), x.dtype)

        t_idx = jnp.arange(T)

        def fwd_step(h, inp):
            x_t, t = inp
            h_new = gru_cell_step(fwd_p, h, x_t)
            valid = (t < lengths)[:, None].astype(x.dtype)
            h = valid * h_new + (1 - valid) * h
            return h, h

        _, fwd_seq = jax.lax.scan(
            fwd_step, h0[0], (jnp.swapaxes(x, 0, 1), t_idx))
        fwd_seq = jnp.swapaxes(fwd_seq, 0, 1)          # [B, T, H]
        fwd_last = fwd_seq[jnp.arange(B), lengths - 1]  # h after last valid

        # backward: per-row roll so each sample's scan starts at its own
        # final valid frame (packed-sequence semantics for ragged lengths)
        rev = jnp.flip(x, axis=1)
        shift = T - lengths  # left-roll amount per row
        rev = jax.vmap(lambda row, s: jnp.roll(row, -s, axis=0))(rev, shift)

        def bwd_step(h, inp):
            x_t, t = inp
            h_new = gru_cell_step(bwd_p, h, x_t)
            valid = (t < lengths)[:, None].astype(x.dtype)
            h = valid * h_new + (1 - valid) * h
            return h, h

        _, bwd_seq = jax.lax.scan(
            bwd_step, h0[1], (jnp.swapaxes(rev, 0, 1), t_idx))
        bwd_seq = jnp.swapaxes(bwd_seq, 0, 1)
        bwd_last = bwd_seq[jnp.arange(B), lengths - 1]

        # un-roll + un-flip so bwd_seq[t] aligns with frame t
        bwd_seq = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(bwd_seq, shift)
        bwd_seq = jnp.flip(bwd_seq, axis=1)

        seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1)
        # torch's pad_packed_sequence yields ZEROS at t >= length; the
        # masked scan instead carries the frozen final hidden there, and
        # downstream unmasked consumers (AttLayer softmax) would attend
        # to those phantom positions
        valid = (t_idx[None, :] < lengths[:, None])[..., None]
        seq = seq * valid.astype(seq.dtype)
        last = jnp.concatenate([fwd_last, bwd_last], axis=-1)
        return seq, last


class MovementConvEncoder(nn.Module):
    """Conv1d movement encoder (``evaluator_models.py:79-98``): two
    stride-2 k=4 p=1 convs with LeakyReLU(0.2) -> /4 temporal, then
    Linear."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Conv(self.hidden_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv1")(x)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        h = leaky_relu(h)
        h = nn.Conv(self.output_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv2")(h)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="out_net")(h)


class TextEncoderBiGRUCo(nn.Module):
    """BiGRU text encoder into the co-embedding space
    (``evaluator_models.py:311-350``)."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs: jnp.ndarray, pos_onehot: jnp.ndarray,
                 cap_lens: jnp.ndarray) -> jnp.ndarray:
        B = word_embs.shape[0]
        pos_embs = nn.Dense(word_embs.shape[-1], name="pos_emb")(pos_onehot)
        inputs = word_embs + pos_embs
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h0 = self.param("hidden", nn.initializers.normal(1.0),
                        (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(h0, (2, B, self.hidden_size))
        _, last = MaskedBiGRU(hidden_size=self.hidden_size,
                              name="gru")(input_embs, cap_lens, h0)
        h = nn.Dense(self.hidden_size, name="output_net_0")(last)
        h = nn.LayerNorm(epsilon=1e-5, name="output_net_1")(h)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="output_net_3")(h)


class MotionEncoderBiGRUCo(nn.Module):
    """BiGRU motion encoder over movement features
    (``evaluator_models.py:353-386``)."""

    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 m_lens: jnp.ndarray) -> jnp.ndarray:
        B = inputs.shape[0]
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h0 = self.param("hidden", nn.initializers.normal(1.0),
                        (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(h0, (2, B, self.hidden_size))
        _, last = MaskedBiGRU(hidden_size=self.hidden_size,
                              name="gru")(input_embs, m_lens, h0)
        h = nn.Dense(self.hidden_size, name="output_net_0")(last)
        h = nn.LayerNorm(epsilon=1e-5, name="output_net_1")(h)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="output_net_3")(h)


class MotionLenEstimatorBiGRU(nn.Module):
    """BiGRU motion-length classifier (``evaluator_models.py:389-438``)."""

    hidden_size: int = 512
    output_size: int = 50  # length buckets

    @nn.compact
    def __call__(self, word_embs: jnp.ndarray, pos_onehot: jnp.ndarray,
                 cap_lens: jnp.ndarray) -> jnp.ndarray:
        B = word_embs.shape[0]
        pos_embs = nn.Dense(word_embs.shape[-1], name="pos_emb")(pos_onehot)
        inputs = word_embs + pos_embs
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h0 = self.param("hidden", nn.initializers.normal(1.0),
                        (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(h0, (2, B, self.hidden_size))
        _, last = MaskedBiGRU(hidden_size=self.hidden_size,
                              name="gru")(input_embs, cap_lens, h0)
        nd = 512
        h = nn.Dense(nd, name="output_0")(last)
        h = nn.LayerNorm(epsilon=1e-5, name="output_1")(h)
        h = leaky_relu(h)
        h = nn.Dense(nd // 2, name="output_3")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="output_4")(h)
        h = leaky_relu(h)
        h = nn.Dense(nd // 4, name="output_6")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="output_7")(h)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="output_9")(h)


class MovementConvDecoder(nn.Module):
    """Transposed-conv movement decoder (``evaluator_models.py:101-120``):
    two stride-2 k=4 p=1 deconvs with LeakyReLU, then Linear — inverts
    MovementConvEncoder's /4 temporal compression."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # SAME padding = exact 2x upsampling, matching torch's
        # ConvTranspose1d(k=4, s=2, p=1) output length
        h = nn.ConvTranspose(self.hidden_size, kernel_size=(4,), strides=(2,),
                             padding="SAME", name="deconv1")(x)
        h = leaky_relu(h)
        h = nn.ConvTranspose(self.output_size, kernel_size=(4,), strides=(2,),
                             padding="SAME", name="deconv2")(h)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="out_net")(h)


def positional_encoding_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Fixed sinusoidal table (``evaluator_models.py:63-77``)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


def reparameterize(rng: jax.Array, mu: jnp.ndarray,
                   logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE reparameterization (``evaluator_models.py:35-38``)."""
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


class TextVAEDecoder(nn.Module):
    """Autoregressive pose decoder cell (``evaluator_models.py:123-185``):
    per-frame input embedding + positional encoding through n stacked
    GRUCells; ``get_init_hidden`` seeds the stack from the text latent.

    Functional API: ``apply(..., method=...)`` with explicit hidden-state
    lists (the torch version mutates them in place)."""

    text_size: int
    input_size: int
    output_size: int
    hidden_size: int
    n_layers: int
    max_len: int = 300

    def setup(self):
        self.emb_dense = nn.Dense(self.hidden_size)
        self.emb_norm = nn.LayerNorm()
        self.z2init = nn.Dense(self.hidden_size * self.n_layers)
        self.cells = [_GRUCellParams(hidden_size=self.hidden_size,
                                     name=f"gru_{i}")
                      for i in range(self.n_layers)]
        self.out_0 = nn.Dense(self.hidden_size)
        self.out_norm = nn.LayerNorm()
        self.out_1 = nn.Dense(self.output_size)
        self.pe = positional_encoding_table(self.max_len, self.hidden_size)

    def get_init_hidden(self, latent: jnp.ndarray):
        hidden = self.z2init(latent)
        return list(jnp.split(hidden, self.n_layers, axis=-1))

    def __call__(self, inputs: jnp.ndarray, hidden, p: jnp.ndarray):
        h_in = leaky_relu(self.emb_norm(self.emb_dense(inputs)))
        h_in = h_in + self.pe[p]
        new_hidden = []
        for i in range(self.n_layers):
            h = self.cells[i](hidden[i], h_in)
            new_hidden.append(h)
            h_in = h
        pose = self.out_1(leaky_relu(self.out_norm(self.out_0(h_in))))
        return pose, new_hidden


class TextDecoder(nn.Module):
    """Text-conditioned latent sampler cell (``evaluator_models.py:
    188-232``): GRUCell stack emitting (z, mu, logvar)."""

    text_size: int
    input_size: int
    output_size: int
    hidden_size: int
    n_layers: int
    max_len: int = 300

    def setup(self):
        self.emb_dense = nn.Dense(self.hidden_size)
        self.emb_norm = nn.LayerNorm()
        self.z2init = nn.Dense(self.hidden_size * self.n_layers)
        self.cells = [_GRUCellParams(hidden_size=self.hidden_size,
                                     name=f"gru_{i}")
                      for i in range(self.n_layers)]
        self.mu_net = nn.Dense(self.output_size)
        self.logvar_net = nn.Dense(self.output_size)
        self.pe = positional_encoding_table(self.max_len, self.hidden_size)

    def get_init_hidden(self, latent: jnp.ndarray):
        hidden = self.z2init(latent)
        return list(jnp.split(hidden, self.n_layers, axis=-1))

    def __call__(self, inputs: jnp.ndarray, hidden, p: jnp.ndarray,
                 rng: jax.Array):
        x_in = leaky_relu(self.emb_norm(self.emb_dense(inputs)))
        x_in = x_in + self.pe[p]
        new_hidden = []
        h = x_in
        for i in range(self.n_layers):
            h = self.cells[i](hidden[i], x_in)
            new_hidden.append(h)
            x_in = h
        mu = self.mu_net(h)
        logvar = self.logvar_net(h)
        z = reparameterize(rng, mu, logvar)
        return z, mu, logvar, new_hidden


class _GRUCellParams(nn.Module):
    """torch.nn.GRUCell-parameterized cell (reuses gru_cell_step math)."""

    hidden_size: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        params = {
            "w_ih": self.param("w_ih", nn.initializers.lecun_normal(),
                               (3 * H, x.shape[-1])),
            "w_hh": self.param("w_hh", nn.initializers.lecun_normal(),
                               (3 * H, H)),
            "b_ih": self.param("b_ih", nn.initializers.zeros, (3 * H,)),
            "b_hh": self.param("b_hh", nn.initializers.zeros, (3 * H,)),
        }
        return gru_cell_step(params, h, x)


class AttLayer(nn.Module):
    """Single-query additive attention (``evaluator_models.py:234-265``)."""

    value_dim: int

    @nn.compact
    def __call__(self, query: jnp.ndarray, key_mat: jnp.ndarray):
        q = nn.Dense(self.value_dim, name="W_q")(query)[..., None]  # [B,V,1]
        v = nn.Dense(self.value_dim, name="W_v")(key_mat)           # [B,S,V]
        k = nn.Dense(self.value_dim, use_bias=False, name="W_k")(key_mat)
        weights = jnp.matmul(k, q) / jnp.sqrt(float(self.value_dim))
        co_weights = jax.nn.softmax(weights, axis=1)                # [B,S,1]
        pred = (v * co_weights).sum(axis=1)
        return pred, co_weights


class TextEncoderBiGRU(nn.Module):
    """Sequence-output BiGRU text encoder (``evaluator_models.py:268-309``):
    returns (per-token fwd||bwd-aligned states, final hidden)."""

    hidden_size: int = 512

    @nn.compact
    def __call__(self, word_embs: jnp.ndarray, pos_onehot: jnp.ndarray,
                 cap_lens: jnp.ndarray):
        B = word_embs.shape[0]
        pos_embs = nn.Dense(word_embs.shape[-1], name="pos_emb")(pos_onehot)
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(
            word_embs + pos_embs)
        h0 = self.param("hidden", nn.initializers.normal(1.0),
                        (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(h0, (2, B, self.hidden_size))
        # MaskedBiGRU already returns the backward stream re-aligned to
        # frame order — the manual flip loop at evaluator_models.py:300-306
        # is built in
        seq, last = MaskedBiGRU(hidden_size=self.hidden_size,
                                name="gru")(input_embs, cap_lens, h0)
        return seq, last


def contrastive_loss(output1: jnp.ndarray, output2: jnp.ndarray,
                     label: jnp.ndarray, margin: float = 3.0) -> jnp.ndarray:
    """Hadsell-Chopra-LeCun contrastive loss
    (``evaluator_models.py:11-24``)."""
    d = jnp.linalg.norm(output1 - output2 + 1e-12, axis=-1, keepdims=True)
    return jnp.mean((1 - label) * d ** 2
                    + label * jnp.clip(margin - d, 0.0, None) ** 2)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _convert_bigru(prefix: str, sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "fwd_w_ih": np.asarray(sd[f"{prefix}.weight_ih_l0"]),
        "fwd_w_hh": np.asarray(sd[f"{prefix}.weight_hh_l0"]),
        "fwd_b_ih": np.asarray(sd[f"{prefix}.bias_ih_l0"]),
        "fwd_b_hh": np.asarray(sd[f"{prefix}.bias_hh_l0"]),
        "bwd_w_ih": np.asarray(sd[f"{prefix}.weight_ih_l0_reverse"]),
        "bwd_w_hh": np.asarray(sd[f"{prefix}.weight_hh_l0_reverse"]),
        "bwd_b_ih": np.asarray(sd[f"{prefix}.bias_ih_l0_reverse"]),
        "bwd_b_hh": np.asarray(sd[f"{prefix}.bias_hh_l0_reverse"]),
    }


def _dense(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def _layernorm(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def convert_torch_evaluator_checkpoint(path: str) -> Dict[str, Any]:
    """Convert a released ``finest.tar`` torch checkpoint into flax param
    trees for (movement, text, motion) encoders.

    Layout per ``evaluator.py:394-414``: keys ``movement_encoder``,
    ``text_encoder``, ``motion_encoder``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def np_sd(d):
        return {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in d.items()}

    mov = np_sd(ckpt["movement_encoder"])
    txt = np_sd(ckpt["text_encoder"])
    mot = np_sd(ckpt["motion_encoder"])

    def conv(sd, name):
        # torch Conv1d weight [out, in, k] -> flax [k, in, out]
        return {"kernel": np.transpose(np.asarray(sd[f"{name}.weight"]),
                                       (2, 1, 0)),
                "bias": np.asarray(sd[f"{name}.bias"])}

    movement_params = {
        "conv1": conv(mov, "main.0"),
        "conv2": conv(mov, "main.3"),
        "out_net": _dense(mov, "out_net"),
    }
    text_params = {
        "pos_emb": _dense(txt, "pos_emb"),
        "input_emb": _dense(txt, "input_emb"),
        "gru": _convert_bigru("gru", txt),
        "hidden": np.asarray(txt["hidden"]),
        "output_net_0": _dense(txt, "output_net.0"),
        "output_net_1": _layernorm(txt, "output_net.1"),
        "output_net_3": _dense(txt, "output_net.3"),
    }
    motion_params = {
        "input_emb": _dense(mot, "input_emb"),
        "gru": _convert_bigru("gru", mot),
        "hidden": np.asarray(mot["hidden"]),
        "output_net_0": _dense(mot, "output_net.0"),
        "output_net_1": _layernorm(mot, "output_net.1"),
        "output_net_3": _dense(mot, "output_net.3"),
    }
    return {"movement": {"params": movement_params},
            "text": {"params": text_params},
            "motion": {"params": motion_params}}


class EvaluatorModelWrapper:
    """Frozen evaluator stack (``evaluator.py:418-502``).

    Protocol constants: dim_word=300, dim_pos_ohot=15, text hidden 512,
    motion hidden 1024, co-embedding 512, movement latent 512, unit_length 4.
    """

    def __init__(self, dim_pose: int = 263, unit_length: int = 4,
                 dim_word: int = 300, dim_pos_ohot: int = 15,
                 dim_movement_latent: int = 512,
                 params: Optional[Dict[str, Any]] = None,
                 rng: Optional[jax.Array] = None):
        self.unit_length = unit_length
        self.movement_enc = MovementConvEncoder(
            hidden_size=512, output_size=dim_movement_latent)
        self.text_enc = TextEncoderBiGRUCo(hidden_size=512, output_size=512)
        self.motion_enc = MotionEncoderBiGRUCo(hidden_size=1024,
                                               output_size=512)
        if params is None:
            rng = rng if rng is not None else jax.random.key(0)
            k1, k2, k3 = jax.random.split(rng, 3)
            params = {
                "movement": self.movement_enc.init(
                    k1, jnp.zeros((1, 8, dim_pose - 4))),
                "text": self.text_enc.init(
                    k2, jnp.zeros((1, 4, dim_word)),
                    jnp.zeros((1, 4, dim_pos_ohot)), jnp.asarray([4])),
                "motion": self.motion_enc.init(
                    k3, jnp.zeros((1, 2, dim_movement_latent)),
                    jnp.asarray([2])),
            }
        self.params = params
        self._jit_co = jax.jit(self._co_embeddings)
        self._jit_mo = jax.jit(self._motion_embeddings)
        self._jit_te = jax.jit(self._text_embeddings)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "EvaluatorModelWrapper":
        return cls(params=convert_torch_evaluator_checkpoint(path), **kw)

    # ------------------------------------------------------------------
    def _motion_embeddings(self, params, motions, m_lens):
        movements = self.movement_enc.apply(params["movement"],
                                            motions[..., :-4])
        return self.motion_enc.apply(params["motion"], movements,
                                     m_lens // self.unit_length)

    def _text_embeddings(self, params, word_embs, pos_ohot, cap_lens):
        return self.text_enc.apply(params["text"], word_embs, pos_ohot,
                                   cap_lens)

    def _co_embeddings(self, params, word_embs, pos_ohot, cap_lens,
                       motions, m_lens):
        motion_embedding = self._motion_embeddings(params, motions, m_lens)
        text_embedding = self._text_embeddings(params, word_embs, pos_ohot,
                                               cap_lens)
        return text_embedding, motion_embedding

    # ------------------------------------------------------------------
    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                          m_lens) -> Tuple[np.ndarray, np.ndarray]:
        """NOTE: unlike the reference (which sorts by length for
        pack_padded_sequence and returns embeddings in sorted order,
        ``evaluator.py:449-479``), the masked scan needs no sorting — results
        keep input order, with text/motion rows aligned."""
        te, me = self._jit_co(self.params, jnp.asarray(word_embs),
                              jnp.asarray(pos_ohot), jnp.asarray(cap_lens),
                              jnp.asarray(motions), jnp.asarray(m_lens))
        return np.asarray(te), np.asarray(me)

    def get_motion_embeddings(self, motions, m_lens) -> np.ndarray:
        return np.asarray(self._jit_mo(self.params, jnp.asarray(motions),
                                       jnp.asarray(m_lens)))

    def get_text_embeddings(self, word_embs, pos_ohot, cap_lens
                            ) -> np.ndarray:
        """Text co-embeddings alone — the motion side may come from the
        fused device path (``GenerationPipeline.generate_motion_
        embeddings``), which never materializes motions on host."""
        return np.asarray(self._jit_te(self.params, jnp.asarray(word_embs),
                                       jnp.asarray(pos_ohot),
                                       jnp.asarray(cap_lens)))
