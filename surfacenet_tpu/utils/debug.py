"""Numerics sanitizers (SURVEY.md SS5: the TPU-native stand-in for the
race-detection/sanitizer column — NaN/Inf and domain checks via checkify).

Usage:
    checked = checked_fn(train_step_like_fn)
    state, loss = checked(...)            # raises with location on NaN/OOB
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked_fn(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable function with checkify NaN/div/OOB checks.

    The wrapped function raises ``checkify.JaxRuntimeError`` (with the
    failing primitive's location) instead of silently propagating NaNs.
    """
    errors = errors or (
        checkify.float_checks | checkify.index_checks | checkify.nan_checks
    )
    cf = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side check that every leaf of a pytree is finite (params/grads)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keystr = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{keystr}: "
                f"{np.isnan(arr).sum()} NaN / {np.isinf(arr).sum()} Inf "
                f"of {arr.size}"
            )
