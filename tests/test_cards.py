"""CARDS tests, including the full-stack golden-data integration test
against the reference's bundled cards_data matrices (io -> dihedrals ->
rotamers -> disorder -> MI), which passes at machine precision."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from enspara_tpu import cards
from enspara_tpu.cards import disorder

REF = '/root/reference/enspara/test/'
HAVE_REF = os.path.isdir(REF)


def test_transitions_1d():
    a = np.array([0, 0, 1, 1, 1, 0, 2])
    tt = disorder.transitions(a)
    assert_array_equal(tt, [1, 4, 5])


def test_transitions_2d_ragged():
    a = np.array([[0, 0, 1], [1, 1, 1]])
    tt = disorder.transitions(a)
    assert_array_equal(tt.lengths, [1, 0])
    assert tt[0, 0] == 1


def test_ord_disord_times():
    # no transitions
    out = disorder.traj_ord_disord_times(np.array([], dtype=int))
    assert out == (0., 0., 0., 0.)
    # single transition at frame 10
    ot, no, dt, nd = disorder.traj_ord_disord_times(np.array([10]))
    assert no == 10
    assert ot == 10 * 11 / 2
    # multiple transitions
    tt = np.array([5, 10, 20])
    ot, no, dt, nd = disorder.traj_ord_disord_times(tt)
    assert dt == np.diff(tt).mean()
    assert nd == 15
    assert no == 20


def test_create_disorder_traj():
    tt = np.array([2, 4, 30])
    # fast transitions (2->4) vs slow disorder time -> first segment
    # disordered, second ordered
    traj = disorder.create_disorder_traj(tt, 40, ord_time=50.,
                                         disord_time=3.)
    assert traj[2:4].all()
    assert not traj[4:30].any()
    assert not traj[30:].any()
    # fewer than 2 transitions -> all ordered
    assert not disorder.create_disorder_traj(
        np.array([5]), 10, 50., 3.).any()


def test_cards_matrices_shapes():
    rng = np.random.default_rng(0)
    trajs = [rng.integers(0, 3, size=(300, 5)).astype('int16')
             for _ in range(2)]
    n_states = np.full(5, 3, dtype='int16')
    ss, dd, sd, ds = cards.cards_matrices(trajs, n_states)
    for m in (ss, dd, sd, ds):
        assert m.shape == (5, 5)
    assert_allclose(sd, ds.T, atol=1e-12)
    assert_allclose(ss, ss.T, atol=1e-12)


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_cards_golden_full_stack():
    """End-to-end parity with the reference's golden CARDS matrices
    (reference: enspara/test/test_cards.py:40-62)."""
    from enspara_tpu import io

    pdb = io.load(os.path.join(REF, 'data/beta-peptide.pdb'))
    trj = io.load(os.path.join(REF, 'data/beta-peptide.xtc'),
                  top=pdb.top)
    ss, dd, sd, ds, inds = cards.cards([trj, trj], buffer_width=15,
                                       n_procs=1)

    assert_allclose(sd, ds.T)
    assert_allclose(ss, ss.T)
    assert_allclose(dd, dd.T)

    data = os.path.join(REF, 'cards_data')
    assert_allclose(ss, np.loadtxt(os.path.join(data,
                                                'cards_ss_mi.dat')),
                    atol=1e-14)
    assert_allclose(dd, np.loadtxt(os.path.join(data,
                                                'cards_dis_mi.dat')),
                    atol=1e-14)
    assert_allclose(sd, np.loadtxt(os.path.join(data,
                                                'cards_s_d_mi.dat')),
                    atol=1e-14)
    assert_allclose(ds, np.loadtxt(os.path.join(data,
                                                'cards_d_s_mi.dat')),
                    atol=1e-14)
    assert_array_equal(inds, np.loadtxt(os.path.join(
        data, 'cards_inds.dat')).astype(int))


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_cards_generator_matches_list():
    from enspara_tpu import io

    pdb = io.load(os.path.join(REF, 'data/beta-peptide.pdb'))
    trj = io.load(os.path.join(REF, 'data/beta-peptide.xtc'),
                  top=pdb.top)[:500]
    gen = (t for t in [trj, trj])
    lst = [trj, trj]
    g = cards.cards(gen)
    l = cards.cards(lst)
    for a, b in zip(g, l):
        assert_allclose(np.asarray(a, dtype=float),
                        np.asarray(b, dtype=float))


def test_disorder_labels_vectorized_matches_loop():
    """The vectorized all-features labeler must equal the scalar
    create_disorder_traj loop feature by feature, including features
    with 0/1 transitions and nan/inf likelihood ratios from degenerate
    mean times."""
    rng = np.random.RandomState(13)
    T, F = 400, 12
    # mix of dwell scales; feature 0 constant (0 transitions),
    # feature 1 a single step (1 transition)
    assigns = rng.randint(0, 3, size=(T, F)).astype(np.int16)
    flips = rng.random((T, F)) < 0.08
    assigns = np.cumsum(flips * rng.randint(1, 3, (T, F)), axis=0) % 3
    assigns[:, 0] = 2
    assigns[:, 1] = 0
    assigns[T // 2:, 1] = 1
    ord_t = rng.uniform(0.5, 50, F)
    dis_t = rng.uniform(0.5, 50, F)
    # degenerate time stats: zero, equal, nan
    ord_t[2], dis_t[2] = 0.0, 0.0
    ord_t[3] = dis_t[3]
    ord_t[4], dis_t[4] = np.nan, 3.0
    ord_t[5], dis_t[5] = 10.0, 0.0

    tts = [disorder.transitions(assigns[:, j]) for j in range(F)]
    seg = disorder._marked_segments(tts, ord_t, dis_t)
    got = disorder._paint_labels(T, F, *seg)
    assert got.dtype == np.int16 and got.shape == (T, F)

    from enspara_tpu.cards.cards import _paint_labels_device
    got_dev = np.asarray(_paint_labels_device(T, F, *seg))
    np.testing.assert_array_equal(got_dev, got)

    for j in range(F):
        want = disorder.create_disorder_traj(tts[j], T, ord_t[j],
                                             dis_t[j])
        np.testing.assert_array_equal(got[:, j], want, 'feature %d' % j)

    # assign_order_disorder end-to-end (host) vs cards_matrices' device
    # labels path: same MI matrices
    host_labels, _ = disorder.assign_order_disorder([assigns, assigns])
    np.testing.assert_array_equal(host_labels[0], host_labels[1])


def test_cards_matrices_sharded_matches_unsharded():
    """Frame-sharded joint counting (GSPMD psum over the contracted
    time axis) must reproduce the single-device matrices exactly —
    counts are integers, so equality is exact, including when the
    frame count does not divide the mesh."""
    from enspara_tpu.parallel import frame_mesh

    rng = np.random.default_rng(3)
    # 301 frames: not a multiple of the 8-device mesh (pad path)
    trajs = [rng.integers(0, 3, size=(301, 5)).astype('int16'),
             rng.integers(0, 3, size=(97, 5)).astype('int16')]
    n_states = np.full(5, 3, dtype='int16')
    ref = cards.cards_matrices(trajs, n_states)
    mesh = frame_mesh()
    out = cards.cards_matrices(trajs, n_states, mesh=mesh)
    for m_ref, m_out in zip(ref, out):
        assert_allclose(m_out, m_ref, atol=1e-13)


def test_joint_counts_sharded_exact():
    from enspara_tpu.info_theory import mutual_info
    from enspara_tpu.parallel import frame_mesh

    rng = np.random.default_rng(4)
    X = rng.integers(0, 4, size=(1003, 3)).astype('int16')
    Y = rng.integers(0, 2, size=(1003, 6)).astype('int16')
    jc = mutual_info.joint_counts(X, Y, 4, 2)
    jc_sh = mutual_info.joint_counts(X, Y, 4, 2, mesh=frame_mesh())
    assert jc.shape == (3, 6, 4, 2)
    assert (np.asarray(jc_sh) == np.asarray(jc)).all()
