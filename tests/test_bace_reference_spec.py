"""Case-by-case port of the reference BACE prune/absorb spec
(/root/reference/enspara/test/test_bace.py:88-200) — the pinned
matrices over the full container-type list. (The reference's own
integration tests are @unittest.skip'd there; ours run live in
tests/test_bace.py.)
"""

import numpy as np
import pytest
from scipy import sparse
from numpy.testing import assert_array_equal

from enspara_tpu.msm import bace
from enspara_tpu.exception import DataInvalid

SUPPORTED_SPARSE_TYPES = [np.array, sparse.csr_matrix,
                          sparse.coo_matrix, sparse.lil_matrix,
                          sparse.csc_matrix, sparse.dia_matrix]


def test_baysean_prune_types():
    """(reference test_bace.py:88)"""
    tcounts = np.array(
        [[100, 10, 1],
         [10, 100, 0],
         [1, 0, 5]])

    exp_pruned = np.array(
        [[107, 10, 0],
         [10, 100, 0],
         [0, 0, 0]])

    for array_type in SUPPORTED_SPARSE_TYPES:
        pruned_counts, labels, kept_states = bace.baysean_prune(
            array_type(tcounts), n_procs=4)

        if sparse.issparse(pruned_counts):
            pruned_counts = pruned_counts.todense()
        assert_array_equal(pruned_counts, exp_pruned)
        assert_array_equal(labels, [0, 1, 0])
        assert_array_equal(kept_states, [0, 1])


def test_baysean_prune_undersampled():
    """factor raises the prune threshold (reference test_bace.py:113)."""
    tcounts = np.array(
        [[100, 10, 1],
         [10, 100, 0],
         [1, 0, 5]])

    pruned_counts, labels, kept_states = bace.baysean_prune(tcounts)
    assert_array_equal(pruned_counts, np.array([[107, 10, 0],
                                                [10, 100, 0],
                                                [0, 0, 0]]))
    assert_array_equal(labels, [0, 1, 0])
    assert_array_equal(kept_states, [0, 1])

    pruned_counts, labels, kept_states = bace.baysean_prune(
        tcounts, factor=1.3)
    exp = np.zeros((3, 3))
    exp[1, 1] = 227
    assert_array_equal(pruned_counts, exp)
    assert_array_equal(labels, [0, 0, 0])
    assert_array_equal(kept_states, [1])


def test_absorb_pinned():
    """(reference test_bace.py:141)"""
    tcounts = np.array(
        [[100, 10, 1],
         [10, 100, 0],
         [1, 0, 5]])

    exp_absorbed = np.array(
        [[107, 10, 0],
         [10, 100, 0],
         [0, 0, 0]])

    for array_type in [np.array, sparse.csr_matrix]:
        absorbed_counts, labels = bace.absorb(array_type(tcounts), [2])
        if sparse.issparse(absorbed_counts):
            absorbed_counts = absorbed_counts.todense()
        assert_array_equal(absorbed_counts, exp_absorbed)
        assert_array_equal(labels, [0, 1, 0])


def test_absorb_island():
    """Absorbing a state with no connections raises
    (reference test_bace.py:164)."""
    tcounts = np.array(
        [[100, 10, 0],
         [10, 100, 0],
         [0, 0, 5]])

    for array_type in [np.array, sparse.csr_matrix]:
        with pytest.raises(DataInvalid):
            bace.absorb(array_type(tcounts), [2])


def test_absorb_empty_row():
    """A fully empty state gets label -1 and is dropped from
    kept_states (reference test_bace.py:176)."""
    tcounts = np.array(
        [[100, 10, 1, 0],
         [10, 100, 0, 0],
         [1, 0, 5, 0],
         [0, 0, 0, 0]])

    exp_pruned = np.array(
        [[107, 10, 0, 0],
         [10, 100, 0, 0],
         [0, 0, 0, 0],
         [0, 0, 0, 0]])

    for array_type in SUPPORTED_SPARSE_TYPES:
        pruned_counts, labels, kept_states = bace.baysean_prune(
            array_type(tcounts), n_procs=4)
        if sparse.issparse(pruned_counts):
            pruned_counts = pruned_counts.todense()
        assert_array_equal(pruned_counts, exp_pruned)
        assert_array_equal(labels, [0, 1, 0, -1])
        assert_array_equal(kept_states, [0, 1])
