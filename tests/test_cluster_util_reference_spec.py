"""Case-by-case port of the reference cluster-util and libdist specs
(/root/reference/enspara/test/test_cluster_util.py, test_libdist.py).
The mdtraj fixture trajectories are replaced by synthetic coordinates;
the contracts (both assign code paths, partition container types,
center-index math, libdist error/out= behavior) are the reference's.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal, assert_allclose
from scipy.spatial.distance import cdist, hamming as scipy_hamming

from enspara_tpu import ra
from enspara_tpu.cluster import util, save_states
from enspara_tpu.cluster.util import _get_distance_method
from enspara_tpu.exception import DataInvalid
from enspara_tpu.geometry import libdist


def test_ClusterResult_partition_np():
    """Uniform lengths partition to plain ndarrays; center indices
    become (traj, frame) pairs (reference test_cluster_util.py:14)."""
    concat_rslt = util.ClusterResult(
        assignments=[0] * 20 + [1] * 20 + [2] * 20,
        distances=[0.2] * 20 + [0.3] * 20 + [0.4] * 20,
        center_indices=[3, 23, 43],
        centers=None)

    rslt = concat_rslt.partition([20, 20, 20])

    assert type(rslt.assignments) is not ra.RaggedArray
    assert type(rslt.distances) is not ra.RaggedArray
    for i, (a, d) in enumerate(((0, 0.2), (1, 0.3), (2, 0.4))):
        assert_array_equal(rslt.assignments[i], [a] * 20)
        assert_array_equal(rslt.distances[i], [d] * 20)
    assert_array_equal(rslt.center_indices, [(0, 3), (1, 3), (2, 3)])


def test_ClusterResult_partition_ra():
    """Ragged lengths partition to RaggedArrays
    (reference test_cluster_util.py:43)."""
    concat_rslt = util.ClusterResult(
        assignments=[0] * 10 + [1] * 20 + [2] * 100,
        distances=[0.2] * 10 + [0.3] * 20 + [0.4] * 100,
        center_indices=[3, 23, 103],
        centers=None)

    rslt = concat_rslt.partition([10, 20, 100])

    assert type(rslt.assignments) is ra.RaggedArray
    assert type(rslt.distances) is ra.RaggedArray
    assert_array_equal(rslt.assignments[2], [2] * 100)
    assert_array_equal(rslt.distances[0], [0.2] * 10)
    assert_array_equal(rslt.center_indices, [(0, 3), (1, 13), (2, 73)])


def test_unique_state_extraction():
    """-1 (unassigned) is never a state
    (reference test_cluster_util.py:71)."""
    rng = np.random.default_rng(0)
    states = [0, 1, 2, 3, 4]
    assignments = rng.choice(states, 100000)
    assert all(save_states.unique_states(assignments) == states)

    states = [-1, 0, 1, 2, 3, 4]
    assignments = rng.choice(states, 100000)
    assert all(save_states.unique_states(assignments) == states[1:])


@pytest.mark.parametrize('metric', ['rmsd', 'euclidean'])
def test_assign_to_nearest_center_few_centers(metric):
    """n_frames > n_centers path (reference test_cluster_util.py:88)."""
    rng = np.random.default_rng(1)
    if metric == 'rmsd':
        trj = rng.standard_normal((50, 10, 3)).astype(np.float32)
    else:
        trj = rng.standard_normal((50, 12)).astype(np.float64)
    center_frames = [0, len(trj) // 3, len(trj) // 2]
    dist_fn = _get_distance_method(metric)

    assigns, distances = util.assign_to_nearest_center(
        trj, trj[center_frames], dist_fn)

    alldists = np.zeros((len(center_frames), len(trj)))
    for i, c in enumerate(center_frames):
        alldists[i] = np.asarray(dist_fn(trj, trj[c]))

    assert_allclose(np.min(alldists, axis=0), distances, atol=1e-3)
    assert_array_equal(np.argmin(alldists, axis=0), assigns)


@pytest.mark.parametrize('metric', ['rmsd', 'euclidean'])
def test_assign_to_nearest_center_many_centers(metric):
    """n_centers > n_frames path, incl. duplicated centers whose ties
    must resolve to the FIRST occurrence
    (reference test_cluster_util.py:107)."""
    rng = np.random.default_rng(2)
    if metric == 'rmsd':
        trj = rng.standard_normal((8, 10, 3)).astype(np.float32)
    else:
        trj = rng.standard_normal((8, 12)).astype(np.float64)
    center_frames = list(range(len(trj))) + list(range(len(trj) // 2))
    dist_fn = _get_distance_method(metric)

    assigns, distances = util.assign_to_nearest_center(
        trj, trj[center_frames], dist_fn)

    alldists = np.zeros((len(center_frames), len(trj)))
    for i, c in enumerate(center_frames):
        alldists[i] = np.asarray(dist_fn(trj, trj[c]))

    assert_allclose(np.min(alldists, axis=0), distances, atol=1e-3)
    assert_array_equal(np.argmin(alldists, axis=0), assigns)


def test_find_cluster_centers_ndarray():
    """(reference test_cluster_util.py:126)"""
    d = np.array([0.2, 0.1, 0.1, 0.2])
    a = np.array([1, 1, 7, 7])
    ctrs = util.find_cluster_centers(assignments=a, distances=d)
    assert_array_equal(ctrs, [1, 2])


# ------------------------------ libdist ------------------------------

def test_hamming_distance_dtypes():
    """hamming works for |S1 bytes and every int/uint width
    (reference test_libdist.py:12)."""
    dtypes = ['|S1']
    for elem_size in ['8', '16', '32', '64']:
        for int_type in ['int', 'uint']:
            dtypes.append(int_type + elem_size)

    for dtype in dtypes:
        X = np.array([[1, 3, 8],
                      [3, 1, 8],
                      [1, 1, 7]]).astype(dtype)
        y = np.array([1, 2, 3]).astype(dtype)

        d_expected = np.array(
            [scipy_hamming(X[i], y) for i in range(len(X))])
        assert_array_equal(d_expected, libdist.hamming(X, y))


@pytest.mark.parametrize('fn_name', ['manhattan', 'euclidean'])
def test_distance_error_contracts(fn_name):
    """Shape-mismatch DataInvalid contracts
    (reference test_libdist.py:34 and :60)."""
    fn = getattr(libdist, fn_name)
    X = np.array([[1, 1], [2, 2], [3, 3], [-1, 3]])
    y = np.array([0, 0])

    with pytest.raises(DataInvalid):
        fn(X, y.reshape(1, -1))
    with pytest.raises(DataInvalid):
        fn(X.reshape(1, -1), y)
    with pytest.raises(DataInvalid):
        fn(X.flatten(), y)
    with pytest.raises(DataInvalid):
        fn(X, y[1:])

    d = fn(X, y)
    metric = 'cityblock' if fn_name == 'manhattan' else 'euclidean'
    assert_array_equal(d, cdist(X, y.reshape(1, -1),
                                metric=metric).flatten())


def test_euclidean_distance_noalloc():
    """out= must be float64 of the right length
    (reference test_libdist.py:85)."""
    X = np.array([[1, 1], [2, 2], [3, 3], [-1, 3]])
    y = np.array([0, 0])

    with pytest.raises(DataInvalid):
        libdist.euclidean(X, y, out=np.empty(X.shape[0], dtype='int'))
    with pytest.raises(DataInvalid):
        libdist.euclidean(X, y, out=np.empty(X.shape[0] - 1))

    d = libdist.euclidean(X, y,
                          out=np.empty(X.shape[0], dtype='float64'))
    assert_array_equal(d, cdist(X, y.reshape(1, -1)).flatten())
