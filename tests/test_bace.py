"""BACE tests against the published 'simple model' oracle from
Bowman 2012 (reference: enspara/test/test_bace.py:19-48)."""

import numpy as np
import pytest
import scipy.sparse
from numpy.testing import assert_array_equal, assert_allclose

from enspara_tpu.msm import bace
from enspara_tpu.exception import DataInvalid

TCOUNTS = np.array(
    [[1000, 100, 100, 10, 0, 0, 0, 0, 0],
     [100, 1000, 100, 0, 0, 0, 0, 0, 0],
     [100, 100, 1000, 0, 1, 0, 0, 0, 0],
     [10, 0, 0, 1000, 100, 100, 10, 0, 0],
     [0, 0, 1, 100, 1000, 100, 0, 0, 0],
     [0, 0, 0, 100, 100, 1000, 0, 1, 0],
     [0, 0, 0, 10, 0, 0, 1000, 100, 100],
     [0, 0, 0, 0, 0, 1, 100, 1000, 100],
     [0, 0, 0, 0, 0, 0, 100, 100, 1000]])

EXP_BAYES_FACTORS = {
    8: 8.54953122e+02, 7: 8.54953122e+02, 6: 8.55428120e+02,
    5: 1.07233398e+03, 4: 1.07233398e+03, 3: 1.08250033e+03,
    2: 4.85322085e+03, 1: 6.72422979e+03}

EXP_LABELS = {
    2: [0, 0, 0, 0, 0, 0, 1, 1, 1],
    3: [0, 0, 0, 1, 1, 1, 2, 2, 2],
    4: [0, 0, 0, 1, 2, 2, 3, 3, 3],
    5: [0, 0, 0, 1, 2, 2, 3, 4, 4],
    6: [0, 1, 1, 2, 3, 3, 4, 5, 5],
    7: [0, 1, 1, 2, 3, 4, 5, 6, 6],
    8: [0, 1, 1, 2, 3, 4, 5, 6, 7]}


@pytest.mark.parametrize('container',
                         [np.array, scipy.sparse.lil_matrix])
def test_bace_simple_model(container):
    bf, labels = bace.bace(container(TCOUNTS), n_macrostates=2,
                           n_procs=1)
    for k, want in EXP_LABELS.items():
        assert_array_equal(labels[k], want)
    for k, want in EXP_BAYES_FACTORS.items():
        # reference stores distances in float32; we keep float64, so
        # agreement is to ~1e-3 relative
        assert_allclose(bf[k], want, rtol=2e-3)


def test_absorb():
    c = np.array([[10, 5, 0], [5, 10, 0], [1, 0, 10]])
    c2, labels = bace.absorb(c.astype(float), [2])
    assert labels[2] == labels[0]
    assert c2[2].sum() == 0
    # state 2's counts moved into state 0
    assert c2[0, 0] == 10 + 1 + 10


def test_absorb_disconnected_raises():
    c = np.array([[10, 0], [0, 5]], dtype=float)
    with pytest.raises(DataInvalid):
        bace.absorb(c, [1])


def test_baysean_prune():
    # state 3 has almost no counts -> pruned
    c = np.array([[100, 10, 0, 1],
                  [10, 100, 10, 0],
                  [0, 10, 100, 0],
                  [1, 0, 0, 1]], dtype=float)
    c2, labels, kept = bace.baysean_prune(c)
    assert 3 not in kept
    assert set(kept) == {0, 1, 2}
    assert labels[3] == labels[0]


def test_merge_bayes_factors_zero_column_and_ratio_form():
    """The log-ratio form must equal the original guarded
    log(p/cp) formulation, including fully-zero columns in both
    profiles (xlogy(0, 0/0) would be nan without the s-guard)."""
    rng = np.random.RandomState(6)
    c1 = rng.randint(0, 5, 40).astype(float)
    c2 = rng.randint(0, 5, size=(7, 40)).astype(float)
    c1[5] = 0.0
    c2[:, 5] = 0.0                      # shared zero column
    c2[3, :] = 0.0                      # fully empty candidate row
    w1 = c1.sum() + 1
    w2 = c2.sum(axis=1) + 1

    got = bace._merge_bayes_factors(c1, w1, c2, w2)
    assert np.isfinite(got).all()

    # original formulation, element-by-element
    want = np.zeros(len(c2))
    for i in range(len(c2)):
        s = c1 + c2[i]
        cp = s / (w1 + w2[i])
        t = 0.0
        for j in range(len(c1)):
            if c1[j] > 0:
                t += c1[j] * np.log((c1[j] / w1) / cp[j])
            if c2[i, j] > 0:
                t += c2[i, j] * np.log((c2[i, j] / w2[i]) / cp[j])
        want[i] = t
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ----------------- live oracle vs the reference -----------------
#
# The reference's SPARSE path crashes on modern scipy (bace.py:132,
# lil fancy assignment via np.matrix), but its DENSE path runs fine —
# so the live fuzz oracle feeds both implementations dense counts.

from _reference_oracle import HAVE_REF, load_reference  # noqa: E402


def _block_counts(rng, n_blocks, block):
    """Metastable counts with widely spread within-block magnitudes
    and distinct inter-block couplings: every greedy merge decision is
    well separated, so the agglomeration path is deterministic across
    implementations (the reference accumulates distances in float32 —
    near-ties would legitimately break differently)."""
    n = n_blocks * block
    C = np.ones((n, n))
    for b in range(n_blocks):
        s = slice(b * block, (b + 1) * block)
        C[s, s] += rng.integers(40, 400,
                                size=(block, block)).astype(float)
    for b in range(n_blocks - 1):
        C[b * block, (b + 1) * block] += 17 + 9 * b
    return C + C.T


@pytest.mark.skipif(not HAVE_REF, reason='reference tree not present')
@pytest.mark.parametrize('seed,n_blocks,block',
                         [(0, 3, 8), (1, 4, 10), (2, 5, 6)])
def test_bace_fuzz_vs_reference(seed, n_blocks, block):
    load_reference()
    from enspara.msm import bace as ref_bace

    rng = np.random.default_rng(seed)
    C = _block_counts(rng, n_blocks, block)

    bf_ours, lab_ours = bace.bace(C.copy(), n_macrostates=2, n_procs=1)
    bf_ref, lab_ref = ref_bace.bace(C.copy(), 2, n_procs=1)

    shared = sorted(set(lab_ours) & set(lab_ref))
    assert len(shared) >= n_blocks
    for k in shared:
        # macro labelings must be identical up to label permutation:
        # same partition of microstates at EVERY agglomeration step
        ours, ref = np.asarray(lab_ours[k]), np.asarray(lab_ref[k])
        pairs_ours = ours[:, None] == ours[None, :]
        pairs_ref = ref[:, None] == ref[None, :]
        assert_array_equal(pairs_ours, pairs_ref)
    for k in sorted(set(bf_ours) & set(bf_ref)):
        # reference accumulates distances in float32
        assert_allclose(bf_ours[k], bf_ref[k], rtol=5e-3)
