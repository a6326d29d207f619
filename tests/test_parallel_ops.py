"""In-jit collective vocabulary tests (parallel/ops.py) — the mesh
replacements for the reference's MPI op set, exercised under shard_map
on the 8-device CPU mesh (mirrors enspara/test/test_mpi_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose, assert_array_equal

from enspara_tpu.parallel import frame_mesh
from enspara_tpu.parallel.mesh import FRAME_AXIS, P
from enspara_tpu.parallel.ops import (striped_max, striped_mean,
                                      global_argmax, distribute_frame)


def _run_sharded(fn, *arrays, out_specs=P()):
    mesh = frame_mesh()
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(P(FRAME_AXIS) for _ in arrays),
        out_specs=out_specs, check_vma=False))(*arrays)


def test_striped_max():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64,)).astype(np.float32)
    out = _run_sharded(lambda xl: striped_max(xl), x)
    assert_allclose(np.asarray(out), x.max())


def test_striped_mean():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64,)).astype(np.float32)
    out = _run_sharded(lambda xl: striped_mean(xl), x)
    assert_allclose(np.asarray(out), x.mean(), rtol=1e-6)


def test_striped_mean_weighted():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64,)).astype(np.float32)
    w = (rng.random(64) > 0.3).astype(np.float32)
    out = _run_sharded(lambda xl, wl: striped_mean(xl, wl), x, w)
    assert_allclose(np.asarray(out), (x * w).sum() / w.sum(),
                    rtol=1e-6)


def test_global_argmax_first_max_tie_break():
    x = np.zeros(64, np.float32)
    x[13] = 5.0
    x[44] = 5.0        # tie: np.argmax picks 13
    val, idx = _run_sharded(
        lambda xl: global_argmax(xl), x,
        out_specs=(P(), P()))
    assert float(val) == 5.0
    assert int(idx) == np.argmax(x) == 13


def test_distribute_frame():
    rng = np.random.default_rng(3)
    data = rng.normal(size=(64, 5, 3)).astype(np.float32)
    # fetch a row owned by a non-zero shard
    out = _run_sharded(
        lambda dl: distribute_frame(dl, jnp.int32(41)), data)
    assert_array_equal(np.asarray(out), data[41])


def test_allgather_obj_rejects_ndim_over_4():
    """The stripe-metadata vector has 4 shape slots; a 5-D array must
    fail loudly instead of corrupting the dtype slot (ADVICE r4)."""
    from enspara_tpu.parallel.ops import _allgather_obj
    import pytest
    with pytest.raises(ValueError, match='ndim'):
        _allgather_obj(np.zeros((1, 1, 1, 1, 1)))
    # 4-D and bool arrays are fine on the 1-process shortcut
    out = _allgather_obj(np.ones((2, 2), dtype=bool))
    assert out[0].dtype == np.dtype(bool)


def test_assemble_striped_empty_stripe(monkeypatch):
    """A process with an empty stripe (fewer items than processes)
    must assemble with the OWNERS' shape/dtype instead of crashing or
    dtype-diverging (r5 review)."""
    from enspara_tpu.parallel import ops

    stripes = [np.ones((1, 3), np.float32),
               np.full((1, 3), 2.0, np.float32),
               np.array([])]                    # this process's stripe
    monkeypatch.setattr(ops, '_proc_info', lambda: (2, 3))
    monkeypatch.setattr(ops, '_allgather_obj', lambda x: stripes)
    out = ops.assemble_striped_array(np.array([]))
    assert out.shape == (2, 3)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out[0], 1.0)
    np.testing.assert_array_equal(out[1], 2.0)

    # ragged: rows striped across 3 processes, this one empty
    rstripes = [np.arange(2, dtype=np.float32),
                np.arange(3, dtype=np.float32) + 10.0,
                np.array([])]
    monkeypatch.setattr(ops, '_allgather_obj', lambda x: rstripes)
    flat = ops.assemble_striped_ragged_array(
        np.array([]), global_lengths=[2, 3])
    assert flat.dtype == np.float32
    np.testing.assert_array_equal(flat, [0, 1, 10, 11, 12])
