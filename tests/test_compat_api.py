"""Name-compat surface for users porting reference (enspara) scripts:
the mpi.ops striped vocabulary (single-process semantics), MPI-era
clustering helpers, shared-pool utilities, and rotamer gate logic.
Reference: enspara/mpi/ops.py, cluster/kcenters.py:103,
cluster/kmedoids.py:365, util/parallel.py:24, geometry/rotamer.py:98.
"""

import numpy as np
from numpy.testing import assert_array_equal

from enspara_tpu.parallel import ops


def test_striped_reductions_single_process():
    assert ops.striped_array_max(np.array([3., 9., 1.])) == 9.0
    assert abs(ops.striped_array_mean(np.array([2., 4.])) - 3.0) < 1e-12


def test_assemble_striped_single_process_identity():
    arr = np.array([5, 6, 7])
    assert_array_equal(ops.assemble_striped_array(arr), arr)
    out = ops.assemble_striped_ragged_array(np.arange(7), [3, 4])
    assert_array_equal(out, np.arange(7))


def test_convert_local_indices():
    # rank 0 owns both trajectories with one process; local index is
    # the position within the rank's concatenated stripe
    assert ops.convert_local_indices([(0, 5)], [3, 4]) == [5]
    assert ops.convert_local_indices([(0, 0), (0, 3)], [3, 4]) == [0, 3]


def test_randind_single_process_uniform_and_seeded():
    r1 = ops.randind(np.arange(10), random_state=3)
    r2 = ops.randind(np.arange(10), random_state=3)
    assert r1 == r2
    assert r1[0] == 0 and 0 <= r1[1] < 10
    import pytest
    from enspara_tpu.exception import DataInvalid
    with pytest.raises(DataInvalid):
        ops.randind(np.array([]))


def test_randind_same_as_np():
    """The (rank, local) pick must reconstruct exactly what
    np.random.RandomState(seed).choice(a) draws (reference:
    test_mpi_ops.py:128 — size=1 stripe here, so a[r::1][o] is
    a[o])."""
    a = np.arange(17)
    for seed in range(100):
        r, o = ops.randind(a, random_state=seed)
        assert np.random.RandomState(seed).choice(a) == a[r::1][o]


def test_randind_uniform():
    """Draws are uniform over the global array (reference:
    test_mpi_ops.py:143)."""
    a = np.arange(10)
    rng = np.random.RandomState(0)
    picks = np.array([ops.randind(a, random_state=rng)[1]
                      for _ in range(5000)])
    counts = np.bincount(picks, minlength=10)
    assert (counts > 400).all() and (counts < 600).all()


def test_kcenters_mpi_alias():
    from enspara_tpu.cluster.kcenters import kcenters_mpi

    X = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    res = kcenters_mpi(X, 'euclidean', n_clusters=3)
    assert len(res.center_indices) == 3


def test_ctr_ids_mpi_formats():
    from enspara_tpu.cluster.kmedoids import ctr_ids_mpi

    # global frame index and (traj, frame) pair forms agree
    assert ctr_ids_mpi([5], [3, 4]) == [(0, 5)]
    assert ctr_ids_mpi([(1, 2)], [3, 4]) == [(0, 5)]


def test_expand_files():
    from enspara_tpu.cluster.util import expand_files

    got = expand_files([['/root/repo/tests/test_compat_*.py']])
    assert got[0] and all(p.endswith('.py') for p in got[0])


def test_shared_array_like_trj():
    from enspara_tpu.util.load import shared_array_like_trj

    class T:
        pass

    t = T()
    t.xyz = np.zeros((2, 4, 3), np.float32)
    buf = shared_array_like_trj([2, 3], t)
    assert buf.shape == (5, 4, 3) and buf.dtype == np.float32


def test_shared_pools_roundtrip():
    import scipy.sparse

    from enspara_tpu.util.parallel import pool_dense2d, pool_sparse2d

    dense = np.arange(6.).reshape(2, 3)
    p, get = pool_dense2d(dense, processes=2)
    try:
        assert_array_equal(p.apply(get), dense)
    finally:
        p.close(); p.join()

    sp = scipy.sparse.coo_matrix(np.eye(3))
    p, get = pool_sparse2d(sp, processes=2)
    try:
        assert_array_equal(p.apply(get).toarray(), np.eye(3))
    finally:
        p.close(); p.join()


def test_rotamer_gate_public_api():
    from enspara_tpu.geometry.rotamer import (get_gates,
                                              is_buffered_transition)

    # basin 0 of [0,120,240,360] wraps: gates (345, 135)
    assert get_gates(0, [0, 120, 240, 360], 15) == (345, 135)
    assert is_buffered_transition(0, 140, [0, 120, 240, 360], 15)
    assert not is_buffered_transition(0, 130, [0, 120, 240, 360], 15)
