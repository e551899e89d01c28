"""Numerical-failure detection.

The reference's only "sanitizer" is a scatter of host-side NaN asserts in
the eval path (SURVEY.md §5: "Race detection / sanitizers: ABSENT"). TPU
equivalents:

- :func:`enable_nan_debugging` — flips ``jax_debug_nans`` so any NaN
  produced inside jitted code raises at the producing op (with re-run in
  op-by-op mode for a precise location).
- :func:`checked` — wraps a function with ``checkify`` so explicit
  ``check_finite`` assertions run ON DEVICE and surface as error values
  without host syncs per step.
- :func:`assert_finite_tree` — host-side pytree NaN/Inf sweep for
  checkpoints and batches (the analog of the reference's asserts).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise (with op-level re-run) whenever jitted code produces a NaN."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(x: jnp.ndarray, name: str = "value") -> None:
    """On-device finite assertion (inside a ``checked`` function)."""
    checkify.check(jnp.isfinite(x).all(), f"non-finite {name} detected")


def checked(fn: Callable) -> Callable:
    """Wrap ``fn`` so its :func:`check_finite` assertions run on device;
    the wrapper raises on the host only when an error fired.

    >>> step = checked(train_step)
    >>> state, metrics = step(state, batch, rng)   # raises on NaN
    """
    cfn = checkify.checkify(fn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Host-side NaN/Inf sweep over a pytree (checkpoint / batch guard)."""
    bad = []

    def visit(path, leaf):
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {', '.join(bad[:10])}"
            + (f" (+{len(bad)-10} more)" if len(bad) > 10 else ""))
