"""Randomized parity of the MSM/TPT/info-theory layers against the
reference implementation imported live from /root/reference (pure
Python paths; see tests/_reference_oracle.py). Complements the fixed
golden-value tests with a much broader input sweep.
"""

import numpy as np
import pytest
import scipy.sparse
from numpy.testing import assert_allclose, assert_array_equal

from _reference_oracle import HAVE_REF, load_reference

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference tree not present')


@pytest.fixture(scope='module')
def ref():
    pkg = load_reference()
    import importlib
    for m in ('enspara.msm', 'enspara.msm.builders',
              'enspara.msm.timescales', 'enspara.msm.bace',
              'enspara.msm.transition_matrices', 'enspara.tpt',
              'enspara.info_theory.mutual_info',
              'enspara.info_theory.entropy', 'enspara.cards.disorder',
              'enspara.ra'):
        importlib.import_module(m)
    return pkg


def _random_assigns(rng, n_traj=4, max_len=60, n_states=5,
                    with_gaps=True):
    rows = []
    for _ in range(n_traj):
        L = int(rng.integers(5, max_len))
        row = rng.integers(0, n_states, size=L)
        if with_gaps and rng.random() < 0.7:
            drop = rng.random(L) < 0.15
            row = np.where(drop, -1, row)
        rows.append(row.astype(np.int64))
    return rows


@pytest.mark.parametrize('lag', [1, 2, 5])
@pytest.mark.parametrize('sliding', [True, False])
def test_assigns_to_counts_fuzz(ref, lag, sliding):
    from enspara_tpu import ra as ours_ra
    from enspara_tpu.msm import assigns_to_counts

    rmsm = ref.msm
    rng = np.random.default_rng(100 * lag + sliding)
    for trial in range(5):
        rows = _random_assigns(rng)
        ours = assigns_to_counts(
            ours_ra.RaggedArray(np.concatenate(rows),
                                lengths=[len(r) for r in rows]),
            lag_time=lag, sliding_window=sliding)
        import enspara.ra as rra
        theirs = rmsm.assigns_to_counts(
            rra.RaggedArray(np.concatenate(rows),
                            lengths=[len(r) for r in rows]),
            lag_time=lag, sliding_window=sliding)
        o = np.asarray(ours.todense())
        t = np.asarray(theirs.todense())
        # matrices may differ in size if trailing states are unvisited
        n = max(o.shape[0], t.shape[0])
        op = np.zeros((n, n)); op[:o.shape[0], :o.shape[1]] = o
        tp = np.zeros((n, n)); tp[:t.shape[0], :t.shape[1]] = t
        assert_array_equal(op, tp,
                           'lag=%d sliding=%s trial=%d' % (lag, sliding,
                                                           trial))


def _random_counts(rng, n=6, dense_frac=0.6, symmetric_boost=True):
    C = rng.integers(0, 30, size=(n, n)).astype(np.float64)
    C[rng.random((n, n)) > dense_frac] = 0
    if symmetric_boost:
        C = C + C.T + np.diag(rng.integers(1, 10, size=n))
    return C


@pytest.mark.parametrize('builder', ['normalize', 'transpose', 'mle'])
@pytest.mark.parametrize('prior', [None, 0.1])
def test_builders_fuzz(ref, builder, prior):
    from enspara_tpu.msm import builders as ours_b

    ref_b = ref.msm.builders
    import zlib
    rng = np.random.default_rng(
        zlib.crc32(repr((builder, prior)).encode()))
    for trial in range(6):
        # the reference's pure-python Prinz MLE asserts exact fp row
        # sums and assumes well-connected counts; feed it the dense
        # positive matrices it was written for
        C = _random_counts(rng, dense_frac=1.0 if builder == 'mle'
                           else 0.6)
        if builder == 'mle':
            C = C + 1.0
        for wrap in (lambda x: x, scipy.sparse.csr_matrix,
                     scipy.sparse.coo_matrix):
            kw = dict(calculate_eq_probs=True)
            if prior is not None:
                kw['prior_counts'] = prior
            oc, ot, oe = getattr(ours_b, builder)(wrap(C.copy()), **kw)
            try:
                tc, tt, te = getattr(ref_b, builder)(wrap(C.copy()),
                                                     **kw)
            except AssertionError:
                if builder == 'mle':
                    # the reference's pure-python MLE asserts EXACT fp
                    # row sums (builders.py:315-316) and trips on some
                    # inputs its own tests never feed it; skip those
                    continue
                raise
            ot = np.asarray(ot.todense()) if scipy.sparse.issparse(ot) \
                else np.asarray(ot)
            tt = np.asarray(tt.todense()) if scipy.sparse.issparse(tt) \
                else np.asarray(tt)
            what = '%s prior=%s trial=%d wrap=%s' % (
                builder, prior, trial, wrap)
            assert_allclose(ot, tt, rtol=1e-8, atol=1e-10, err_msg=what)
            # the reference returns (n, 1) eq-probs for sparse inputs
            # (np.matrix sum artifact); compare flattened
            assert_allclose(np.asarray(oe).ravel(),
                            np.asarray(te).ravel(),
                            rtol=1e-6, atol=1e-9, err_msg=what)


def test_eigenspectrum_fuzz(ref):
    from enspara_tpu.msm import builders as ours_b
    from enspara_tpu.msm import eigenspectrum as ours_eig

    rtm = ref.msm.transition_matrices
    rng = np.random.default_rng(7)
    for trial in range(5):
        C = _random_counts(rng, n=8)
        _, T, _ = ours_b.transpose(C, calculate_eq_probs=False)
        ov, ovecs = ours_eig(T, n_eigs=4, left=True)
        tv, tvecs = rtm.eigenspectrum(T, n_eigs=4, left=True)
        assert_allclose(ov, tv, rtol=1e-8, atol=1e-10)
        # eigenvectors up to sign
        for k in range(4):
            a, b = np.real(ovecs[:, k]), np.real(tvecs[:, k])
            sign = np.sign(np.dot(a, b)) or 1.0
            assert_allclose(a, sign * b, rtol=1e-6, atol=1e-8)


def test_trim_disconnected_fuzz(ref):
    from enspara_tpu.msm import trim_disconnected as ours_trim

    rtm = ref.msm.transition_matrices
    rng = np.random.default_rng(11)
    for trial in range(8):
        n = int(rng.integers(4, 10))
        C = rng.integers(0, 4, size=(n, n)).astype(np.int64)
        # carve an isolated block half the time
        if trial % 2:
            cut = n // 2
            C[:cut, cut:] = 0
        for thresh in (1, 2):
            om, oc = ours_trim(scipy.sparse.coo_matrix(C),
                               threshold=thresh)
            tm, tc = rtm.trim_disconnected(scipy.sparse.coo_matrix(C),
                                           threshold=thresh)
            assert om.to_mapped == tm.to_mapped, (trial, thresh)
            assert_array_equal(np.asarray(oc.todense()),
                               np.asarray(tc.todense()))


def test_implied_timescales_fuzz(ref):
    from enspara_tpu import ra as ours_ra
    from enspara_tpu.msm import builders as ours_b
    from enspara_tpu.msm.timescales import implied_timescales as ours_it

    rit = ref.msm.timescales.implied_timescales
    ref_b = ref.msm.builders
    rng = np.random.default_rng(13)
    rows = _random_assigns(rng, n_traj=3, max_len=200, n_states=4,
                           with_gaps=False)
    import enspara.ra as rra
    lag_times = [1, 2, 4]
    ours = ours_it(
        ours_ra.RaggedArray(np.concatenate(rows),
                            lengths=[len(r) for r in rows]),
        lag_times, method=ours_b.transpose, n_times=3)
    theirs = rit(
        rra.RaggedArray(np.concatenate(rows),
                        lengths=[len(r) for r in rows]),
        lag_times, method=ref_b.transpose, n_times=3)
    assert_allclose(np.asarray(ours), np.asarray(theirs),
                    rtol=1e-7, atol=1e-9)


def _random_tprob(rng, n=7):
    C = _random_counts(rng, n=n) + 1.0
    T = C / C.sum(axis=1, keepdims=True)
    return T


def test_tpt_committors_mfpts_fluxes_paths_fuzz(ref):
    from enspara_tpu import tpt as ours_tpt

    rtpt = ref.tpt
    rng = np.random.default_rng(17)
    for trial in range(5):
        T = _random_tprob(rng)
        src, snk = [0], [6]
        oc = ours_tpt.committors(T, src, snk)
        tc = rtpt.committors(T, src, snk)
        assert_allclose(oc, tc, rtol=1e-8, atol=1e-10)

        om = ours_tpt.mfpts(T)
        tm = rtpt.mfpts(T)
        assert_allclose(om, tm, rtol=1e-7, atol=1e-8)

        def _dense(x):
            return np.asarray(x.todense() if scipy.sparse.issparse(x)
                              else x)

        onf = _dense(ours_tpt.net_fluxes(T, src, snk))
        tnf = _dense(rtpt.net_fluxes(T, src, snk))
        assert_allclose(onf, tnf, rtol=1e-8, atol=1e-12)

        op, ofl = ours_tpt.top_path(src, snk, onf)
        tp, tfl = rtpt.top_path(src, snk, tnf)
        assert_array_equal(op, tp)
        assert_allclose(ofl, tfl, rtol=1e-8)

        opaths, ofluxes = ours_tpt.paths(src, snk, onf, num_paths=3)
        tpaths, tfluxes = rtpt.paths(src, snk, tnf, num_paths=3)
        assert [list(p) for p in opaths] == [list(p) for p in tpaths]
        assert_allclose(ofluxes, tfluxes, rtol=1e-8)


def test_mutual_info_fuzz(ref):
    from enspara_tpu.info_theory import mutual_info as ours_mi

    rmi = ref.info_theory.mutual_info
    rng = np.random.default_rng(19)
    for trial in range(4):
        T, F, S = 300, 5, 3
        states = rng.integers(0, S, size=(T, F)).astype(np.int32)

        ojc = np.asarray(ours_mi.joint_counts(states, n_x=S))
        tjc = np.asarray(rmi.joint_counts(states, n_x=S))
        assert_array_equal(ojc, tjc.astype(ojc.dtype))

        omi = np.asarray(ours_mi.mutual_information(ojc))
        tmi = np.asarray(rmi.mutual_information(tjc))
        assert_allclose(omi, tmi, rtol=1e-9, atol=1e-12)

        # MSM-weighted MI from one-hot features (per-feature state
        # counts, as both APIs expect)
        w = rng.random(T); w = w / w.sum()
        nfs = [S] * F
        owm = np.asarray(ours_mi.weighted_mi(states, w,
                                             n_feature_states=nfs))
        twm = np.asarray(rmi.weighted_mi(states, w,
                                         n_feature_states=nfs))
        # fp32 device matmuls vs the reference's fp64 numpy
        assert_allclose(owm, twm, rtol=1e-4, atol=1e-6)

        # both validators demand exact symmetry; fp summation order
        # leaves ~1e-17 asymmetry, so symmetrize first (as the CARDS
        # driver's accumulated matrices are by construction)
        omi_s = (omi + omi.T) / 2
        tmi_s = (tmi + tmi.T) / 2
        onmi = np.asarray(ours_mi.mi_to_nmi_apc(omi_s))
        tnmi = np.asarray(rmi.mi_to_nmi_apc(tmi_s))
        assert_allclose(onmi, tnmi, rtol=1e-8, atol=1e-10)


def test_entropy_fuzz(ref):
    from enspara_tpu.info_theory import entropy as ours_ent

    rent = ref.info_theory.entropy
    rng = np.random.default_rng(23)
    for trial in range(4):
        p = rng.random((5, 6)); p = p / p.sum(axis=1, keepdims=True)
        q = rng.random((5, 6)); q = q / q.sum(axis=1, keepdims=True)
        assert_allclose(ours_ent.shannon_entropy(p),
                        rent.shannon_entropy(p), rtol=1e-10)
        assert_allclose(ours_ent.kl_divergence(p, q),
                        rent.kl_divergence(p, q), rtol=1e-10)
        assert_allclose(ours_ent.js_divergence(p, q),
                        rent.js_divergence(p, q), rtol=1e-10)


def test_disorder_fuzz(ref):
    from enspara_tpu.cards import disorder as ours_dis

    rdis = ref.cards.disorder
    rng = np.random.default_rng(29)
    for trial in range(4):
        # 1-D transitions
        states = rng.integers(0, 2, size=150).astype(np.int64)
        assert_array_equal(np.asarray(ours_dis.transitions(states)),
                           np.asarray(rdis.transitions(states)))
        # list of (n_frames, n_features) rotamer trajectories
        trajs = [rng.integers(0, 3, size=(int(rng.integers(40, 90)), 4))
                 for _ in range(3)]
        o = ours_dis.transition_stats(trajs)
        t = rdis.transition_stats(trajs)
        assert len(o) == len(t)
        for ov, tv in zip(o[1:], t[1:]):   # mean ordered/disordered
            assert_allclose(np.asarray(ov), np.asarray(tv),
                            rtol=1e-10, err_msg='trial=%d' % trial)
        for orow, trow in zip(o[0], t[0]):  # per-traj transition sets
            ofeat = [np.asarray(x) for x in orow]
            tfeat = [np.asarray(x) for x in trow]
            assert len(ofeat) == len(tfeat)
            for a, b in zip(ofeat, tfeat):
                assert_array_equal(a, b)

        # disorder segment labeling from transition times
        tt = np.asarray(rdis.transitions(states))
        od = ours_dis.create_disorder_traj(tt, 150, 5.0, 20.0)
        td = rdis.create_disorder_traj(tt, 150, 5.0, 20.0)
        assert_array_equal(np.asarray(od), np.asarray(td))


# NOTE: no BACE fuzz against the live reference — its mergeTwoClosest
# States path crashes on modern numpy ('shape mismatch in assignment',
# bace.py:122 era code predates current fancy-indexing rules), so the
# oracle cannot execute. BACE parity is covered by the published-result
# oracle in tests/test_bace.py instead.
