"""Fast NON-DEGENERATE benchmark params.

The r1/r2 benches created all-zeros param trees (timing on TPU is
value-independent and real flax init of the 363M flagship costs minutes).
But zero params are numerically degenerate for TRAINING benchmarks: every
LayerNorm input is the zero vector, so the L2-stabilization backward
amplifies by 1/1e-12, the global grad norm overflows float32, and the
clipped update is NaN from step one (reproduced with the pure-JAX
backward too — not a kernel artifact). Throughput numbers were unaffected,
but convergence checks were impossible.

This initializer builds a HEALTHY-SHAPED random tree in ONE jitted
program on the device: fan-in-scaled normals for weights, ones for
*scale params, zeros for biases — seconds instead of the minutes real
flax init takes on the 1-core host, and finite losses/grads for as many
benchmark steps as needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_benchmark_params(shapes, seed: int = 0):
    """Device-resident pseudo-init for a param/variable tree of
    ShapeDtypeStructs (from ``jax.eval_shape`` of ``model.init``)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def build():
        key = jax.random.key(seed, impl="rbg")
        out = []
        for i, (path, s) in enumerate(leaves):
            name = jax.tree_util.keystr(path).lower()
            if name.endswith("scale']"):
                out.append(jnp.ones(s.shape, s.dtype))
            elif (name.endswith("bias']") or s.ndim == 0
                  or not jnp.issubdtype(s.dtype, jnp.floating)):
                out.append(jnp.zeros(s.shape, s.dtype))
            else:
                fan_in = s.shape[-2] if s.ndim >= 2 else s.shape[-1]
                std = (1.0 / max(fan_in, 1)) ** 0.5
                out.append(std * jax.random.normal(
                    jax.random.fold_in(key, i), s.shape, s.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(build)()
