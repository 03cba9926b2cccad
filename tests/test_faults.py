"""Fault injection: crash-resilient resume + numerics sanitizers
(SURVEY.md SS5 failure-detection / sanitizer rows)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore
from surfacenet_tpu.utils.debug import assert_all_finite, checked_fn


def _add_cube(st, g, seed=0):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(size=(8, 8, 8)) < 0.1
    occ[0, 0, 0] = True
    st.add(CubeResult(g, occ, rng.uniform(0.5, 1, (8, 8, 8)).astype(
        np.float32)))


def test_resume_after_torn_ledger_write(tmp_path):
    """A process killed mid-append leaves a truncated JSON line; resume must
    skip it and redo only that cube."""
    ledger = str(tmp_path / "ledger.jsonl")
    st = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    _add_cube(st, (0, 0, 0), 0)
    _add_cube(st, (1, 0, 0), 1)

    # simulate the crash: truncate the last line mid-record
    raw = open(ledger).read()
    lines = raw.strip().split("\n")
    torn = "\n".join(lines[:-1]) + "\n" + lines[-1][: len(lines[-1]) // 2]
    open(ledger, "w").write(torn)

    st2 = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    assert st2.done_set() == {(0, 0, 0)}  # torn cube forgotten -> redo
    # and the store still merges
    pts, _, _ = st2.merge()
    assert len(pts) > 0


def test_resume_after_garbage_line(tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    with open(ledger, "w") as f:
        f.write(json.dumps({"grid_idx": [0, 0, 0], "empty": True}) + "\n")
        f.write("not json at all\n")
        f.write(json.dumps({"grid_idx": [1, 0, 0], "empty": True}) + "\n")
    st = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    assert st.done_set() == {(0, 0, 0), (1, 0, 0)}


def test_checked_fn_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked_fn(jax.jit(bad))
    # fine on valid input
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    from jax.experimental import checkify as ck

    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_assert_all_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_all_finite(good)
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite(bad, "params")
