"""Expert-parallel all-to-all MoE vs single-device parity (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from motiondiffusion_moe_tpu.parallel import make_mesh
from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS
from motiondiffusion_moe_tpu.parallel.moe_parallel import make_ep_moe_layer


def _params(E, D, H, seed=0):
    ks = jax.random.split(jax.random.key(seed), 6)
    return {
        "gate_w": jax.random.normal(ks[0], (D, E)) * 0.5,
        "gate_b": jnp.zeros((E,)),
        "w1": jax.random.normal(ks[1], (E, D, H)) * 0.1,
        "b1": jax.random.normal(ks[2], (E, H)) * 0.01,
        "w2": jax.random.normal(ks[3], (E, H, D)) * 0.1,
        "b2": jax.random.normal(ks[4], (E, D)) * 0.01,
    }


def _dense_reference(x, p, top_k=2):
    """Exact (no-drop) dense-compute reference."""
    logits = x @ p["gate_w"] + p["gate_b"]
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    E = p["gate_w"].shape[1]
    combine = jnp.zeros((x.shape[0], E))
    for j in range(top_k):
        combine = combine + jax.nn.one_hot(top_idx[:, j], E) * top_vals[:, j:j+1]
    h = jnp.einsum("sd,edh->esh", x, p["w1"]) + p["b1"][:, None, :]
    h = jax.nn.gelu(h)
    y = jnp.einsum("esh,ehd->esd", h, p["w2"]) + p["b2"][:, None, :]
    return jnp.einsum("esd,se->sd", y, combine)


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_moe_matches_dense(ep):
    E, D, H = 8, 16, 32
    S = 64  # divisible by 8 devices
    mesh = make_mesh(8, expert_parallel=ep)
    x = jax.random.normal(jax.random.key(1), (S, D))
    p = _params(E, D, H)

    ref = _dense_reference(x, p)

    layer = make_ep_moe_layer(mesh, num_experts=E, top_k=2,
                              capacity_factor=8.0)  # ample: no drops
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P((DATA_AXIS, EXPERT_AXIS))))
        ps = {
            k: jax.device_put(v, NamedSharding(
                mesh, P(EXPERT_AXIS) if k in ("w1", "b1", "w2", "b2") else P()))
            for k, v in p.items()
        }
        out = layer(xs, ps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_moe_capacity_drops_gracefully():
    """With tight capacity some token-expert assignments drop: output stays
    finite and differs from the ample-capacity result."""
    E, D, H = 8, 16, 32
    mesh = make_mesh(8, expert_parallel=2)
    # skew the gate so most tokens want expert 0 -> capacity 1/shard drops
    x = jax.random.normal(jax.random.key(1), (64, D))
    p = _params(E, D, H)
    p["gate_b"] = jnp.asarray([5.0] + [0.0] * (E - 1))

    def run(cf):
        layer = make_ep_moe_layer(mesh, num_experts=E, capacity_factor=cf)
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh,
                                                 P((DATA_AXIS, EXPERT_AXIS))))
            ps = {k: jax.device_put(v, NamedSharding(
                mesh, P(EXPERT_AXIS) if k in ("w1", "b1", "w2", "b2") else P()))
                for k, v in p.items()}
            return np.asarray(layer(xs, ps))

    tight = run(1e-9)   # capacity clamps to 1 per expert per shard
    ample = run(8.0)
    assert np.isfinite(tight).all()
    # expert 0 is oversubscribed (8 tokens/shard want it, capacity 1)
    assert np.abs(tight - ample).max() > 1e-3
