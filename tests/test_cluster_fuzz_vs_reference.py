"""Randomized parity of the clustering layer against the live
reference (see tests/_reference_oracle.py; the reference's Cython
libdist is stubbed with its documented numpy/scipy equivalents, which
the reference's own test_libdist.py uses as the oracle).

k-centers is fully deterministic (first-max/first-min tie-breaks), so
assignments and center indices must match EXACTLY; the PAM update is
deterministic once proposals are pinned.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from _reference_oracle import HAVE_REF, load_reference

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference tree not present')


@pytest.fixture(scope='module')
def ref():
    pkg = load_reference()
    import importlib
    for m in ('enspara.cluster.kcenters', 'enspara.cluster.kmedoids',
              'enspara.cluster.util', 'enspara.geometry.libdist'):
        importlib.import_module(m)
    return pkg


@pytest.mark.parametrize('metric', ['euclidean', 'manhattan'])
def test_kcenters_exact_parity(ref, metric):
    from enspara_tpu.cluster import kcenters as ours_kc
    from enspara_tpu.geometry import libdist as ours_ld

    rkc = ref.cluster.kcenters.kcenters
    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(41)
    for trial in range(4):
        X = rng.normal(size=(150, 4)) * (1 + trial)
        ours = ours_kc(X, getattr(ours_ld, metric), n_clusters=7)
        theirs = rkc(X, getattr(rld, metric), n_clusters=7,
                     dist_cutoff=0)
        assert_array_equal(np.asarray(ours.center_indices),
                           np.asarray(theirs.center_indices))
        assert_array_equal(np.asarray(ours.assignments),
                           np.asarray(theirs.assignments))
        # ours computes distances in fp32 on device
        assert_allclose(np.asarray(ours.distances),
                        np.asarray(theirs.distances),
                        rtol=1e-5, atol=1e-6)


def test_kcenters_dist_cutoff_parity(ref):
    from enspara_tpu.cluster import kcenters as ours_kc
    from enspara_tpu.geometry import libdist as ours_ld

    rkc = ref.cluster.kcenters.kcenters
    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(43)
    X = rng.normal(size=(200, 3))
    for cutoff in (2.0, 1.0, 0.5):
        ours = ours_kc(X, ours_ld.euclidean, dist_cutoff=cutoff)
        theirs = rkc(X, rld.euclidean, dist_cutoff=cutoff,
                     n_clusters=np.inf)
        assert_array_equal(np.asarray(ours.center_indices),
                           np.asarray(theirs.center_indices))
        assert_array_equal(np.asarray(ours.assignments),
                           np.asarray(theirs.assignments))


def test_kcenters_init_centers_parity(ref):
    from enspara_tpu.cluster import kcenters as ours_kc
    from enspara_tpu.geometry import libdist as ours_ld

    rkc = ref.cluster.kcenters.kcenters
    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(47)
    X = rng.normal(size=(120, 3))
    init = X[[5, 50]]
    ours = ours_kc(X, ours_ld.euclidean, n_clusters=5,
                   init_centers=init.copy())
    theirs = rkc(X, rld.euclidean, n_clusters=5, dist_cutoff=0,
                 init_centers=init.copy())
    assert_array_equal(np.asarray(ours.assignments),
                       np.asarray(theirs.assignments))
    assert_array_equal(np.asarray(ours.center_indices),
                       np.asarray(theirs.center_indices))


def test_pam_update_pinned_proposals_parity(ref):
    from enspara_tpu.cluster.kmedoids import (
        _kmedoids_pam_update as ours_pam)
    from enspara_tpu.geometry import libdist as ours_ld

    rpam = ref.cluster.kmedoids._kmedoids_pam_update
    rkc = ref.cluster.kcenters.kcenters
    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(53)
    for trial in range(4):
        X = rng.normal(size=(150, 4))
        seed = rkc(X, rld.euclidean, n_clusters=6, dist_cutoff=0)
        proposals = [int(rng.integers(0, 150)) for _ in range(6)]

        o_inds, o_d, o_a, _ = ours_pam(
            X, ours_ld.euclidean,
            list(np.asarray(seed.center_indices)),
            np.asarray(seed.assignments).copy(),
            np.asarray(seed.distances).copy(),
            proposals=list(proposals))
        t_inds, t_d, t_a, _ = rpam(
            X, rld.euclidean,
            list(np.asarray(seed.center_indices)),
            np.asarray(seed.assignments).copy(),
            np.asarray(seed.distances).copy(),
            proposals=list(proposals))
        assert_array_equal(np.asarray(o_inds), np.asarray(t_inds),
                           'trial %d' % trial)
        assert_array_equal(o_a, t_a)
        assert_allclose(o_d, t_d, rtol=1e-5, atol=1e-6)


def test_assign_and_find_centers_parity(ref):
    from enspara_tpu.cluster.util import (assign_to_nearest_center,
                                          find_cluster_centers)
    from enspara_tpu.geometry import libdist as ours_ld

    rutil = ref.cluster.util
    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(59)
    X = rng.normal(size=(100, 5))
    centers = X[[3, 30, 77]]

    oa, od = assign_to_nearest_center(X, centers, ours_ld.euclidean)
    ta, td = rutil.assign_to_nearest_center(X, centers, rld.euclidean)
    assert_array_equal(oa, ta)
    assert_allclose(od, td, rtol=1e-12)

    oc = find_cluster_centers(oa, od)
    tc = rutil.find_cluster_centers(ta, td)
    assert_array_equal(np.asarray(oc), np.asarray(tc))


def test_libdist_parity(ref):
    from enspara_tpu.geometry import libdist as ours_ld

    import sys
    rld = sys.modules['enspara.geometry.libdist']
    rng = np.random.default_rng(61)
    X = rng.normal(size=(50, 8))
    y = rng.normal(size=8)
    assert_allclose(ours_ld.euclidean(X, y), rld.euclidean(X, y),
                    rtol=1e-12)
    assert_allclose(ours_ld.manhattan(X, y), rld.manhattan(X, y),
                    rtol=1e-12)
    Xi = rng.integers(0, 3, size=(50, 8))
    yi = rng.integers(0, 3, size=8)
    assert_allclose(ours_ld.hamming(Xi, yi), rld.hamming(Xi, yi),
                    rtol=1e-12)


def test_assign_many_centers_with_ties_parity(ref):
    """Exercise the 32-center block boundary of the rewritten
    assign_to_nearest_center and exact-tie frames (duplicated points):
    the reference's first-minimum tie-break must survive both."""
    from enspara_tpu.cluster.util import (assign_to_nearest_center,
                                          find_cluster_centers)
    from enspara_tpu.geometry import libdist as ours_ld

    rutil = ref.cluster.util
    import sys
    rld = sys.modules['enspara.geometry.libdist']

    rng = np.random.default_rng(613)
    for trial in range(3):
        X = rng.normal(size=(400, 4))
        # duplicate some frames so several (frame, center) distances
        # tie exactly at 0 and between identical rows
        X[50:70] = X[10:30]
        ctr_inds = rng.choice(400, size=80, replace=False)
        centers = X[ctr_inds]

        oa, od = assign_to_nearest_center(X, centers, ours_ld.euclidean)
        ta, td = rutil.assign_to_nearest_center(X, centers,
                                                rld.euclidean)
        assert_array_equal(oa, ta, 'trial %d' % trial)
        assert_allclose(od, td, rtol=1e-12, atol=1e-12)

        assert_array_equal(np.asarray(find_cluster_centers(oa, od)),
                           np.asarray(rutil.find_cluster_centers(ta, td)))


def test_compute_batches_parity(ref):
    """Deliberate divergence from exact reference layout: the
    reference's strict-< packing leaves an EMPTY leading batch when a
    trajectory exactly fills the budget, which crashes its own loader
    downstream; ours packs exact fits into the current batch. The
    parity contract is therefore the packing INVARIANTS (all indices
    in order, sums within budget, no empty batches) plus exact layout
    agreement whenever no exact fit occurs."""
    from enspara_tpu.cluster.util import compute_batches

    rng = np.random.default_rng(19)
    for trial in range(20):
        lengths = rng.integers(1, 500, size=rng.integers(1, 40)).tolist()
        batch_size = int(rng.integers(1, 1200))
        ours = compute_batches(lengths, batch_size)
        flat = [i for b in ours for i in b]
        assert flat == list(range(len(lengths)))
        for b in ours:
            assert b, 'empty batch emitted'
            if len(b) > 1:
                assert sum(lengths[i] for i in b) <= batch_size
        theirs = [list(b) for b in
                  ref.cluster.util.compute_batches(lengths, batch_size)]
        # <=-packing is at least as tight as the reference's strict-<
        # greedy (every exact fit saves a batch, nothing else moves)
        assert len(ours) <= len([b for b in theirs if b]), (
            'trial %d: lengths=%s batch=%s'
            % (trial, lengths, batch_size))

    # the exact-fit case itself: reference emits [[], [0]]; we pack it
    assert compute_batches([7, 3], 7) == [[0], [1]]


def test_cluster_result_partition_parity(ref):
    """Uniform and ragged partitions of a ClusterResult round-trip the
    same values as the reference's partition()."""
    from enspara_tpu.cluster.util import ClusterResult

    rng = np.random.default_rng(7)
    for lengths in ([5, 5, 5], [4, 7, 2]):
        n = sum(lengths)
        assigns = rng.integers(0, 3, size=n)
        dists = rng.random(n)
        ctr_inds = [0, 6, n - 1]

        ours = ClusterResult(center_indices=list(ctr_inds),
                             distances=dists.copy(),
                             assignments=assigns.copy(),
                             centers=None).partition(lengths)
        theirs = ref.cluster.util.ClusterResult(
            center_indices=list(ctr_inds), distances=dists.copy(),
            assignments=assigns.copy(), centers=None).partition(lengths)

        for row_o, row_t in zip(ours.assignments, theirs.assignments):
            assert_array_equal(np.asarray(row_o), np.asarray(row_t))
        for row_o, row_t in zip(ours.distances, theirs.distances):
            assert_allclose(np.asarray(row_o), np.asarray(row_t))
        assert [tuple(p) for p in ours.center_indices] == \
               [tuple(p) for p in theirs.center_indices]
