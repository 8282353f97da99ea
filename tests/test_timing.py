"""utils/timing.py — chained-dispatch timing + floor guard."""

import jax.numpy as jnp
import numpy as np
import pytest

from dream_gnn_tpu.utils.timing import (ImplausibleTiming, chained_ms,
                                        spmm_gather_floor_ms)


def test_chained_ms_measures_something_positive():
    # Big enough that one application clearly exceeds host timing noise
    # on the CPU test platform.
    x = jnp.ones((768, 768), jnp.float32)
    ms = chained_ms(lambda x: x @ x, x, n=4, reps=2)
    assert np.isfinite(ms)
    assert 0.0 < ms < 10_000.0


def test_chained_ms_args_are_threaded():
    x = jnp.ones((128, 128), jnp.float32)
    w = jnp.full((128, 128), 2.0, jnp.float32)
    ms = chained_ms(lambda x, w: x @ w, x, args=(w,), n=3, reps=2)
    assert np.isfinite(ms)


def test_floor_guard_rejects_impossible_readings():
    x = jnp.ones((8, 8), jnp.float32)
    # A tiny op cannot possibly take 10 minutes per application; a
    # floor above any credible reading must trip the guard.
    with pytest.raises(ImplausibleTiming):
        chained_ms(lambda x: x + 1.0, x, n=4, reps=2, floor_ms=6e5,
                   name="guard-test")


def test_spmm_floor_scales_with_layout():
    from dream_gnn_tpu.graph.grouped import grouped_from_arrays

    rng = np.random.default_rng(0)
    src = rng.integers(0, 600, 4000)
    dst = rng.integers(0, 500, 4000)
    val = np.ones(4000, np.float32)
    g = grouped_from_arrays(src, dst, val, 600, 500)
    f_packed = spmm_gather_floor_ms(g, 128, packed=True)
    f_unpacked = spmm_gather_floor_ms(g, 128, packed=False)
    # Packed halves panel bytes, so the HBM component can only shrink;
    # the floor is max(HBM, MXU), so equality is legal when the MXU
    # term dominates (it does for this small dense-ish layout).
    assert 0.0 < f_packed <= f_unpacked
