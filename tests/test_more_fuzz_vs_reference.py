"""Second oracle batch: rotamer hysteresis, synthetic ensembles,
exposons-from-SASAs, and the MSM estimator, fuzzed against the live
reference (see tests/_reference_oracle.py)."""

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
    for m in ('enspara.geometry.rotamer', 'enspara.msm.synthetic_data',
              'enspara.info_theory.exposons', 'enspara.msm.msm',
              'enspara.msm.builders'):
        importlib.import_module(m)
    return pkg


def test_rotamer_hysteresis_fuzz(ref):
    from enspara_tpu.geometry import rotamer as ours_rot

    rrot = ref.geometry.rotamer
    rng = np.random.default_rng(67)
    for bounds in ([0, 120, 240, 360], [0, 180, 360], [0, 90, 360],
                   [0, 100, 200, 300, 360]):
        for buffer_width in (5, 15, 30):
            n_basins = len(bounds) - 1
            if buffer_width >= 360. / n_basins:
                continue
            angles = rng.random(400) * 359.9
            o = ours_rot._rotamers(angles, bounds, buffer_width)
            t = rrot._rotamers(angles, bounds, buffer_width)
            assert_array_equal(np.asarray(o), np.asarray(t),
                               'bounds=%s buf=%s' % (bounds,
                                                     buffer_width))


def test_rotamer_device_matches_reference(ref):
    from enspara_tpu.geometry import rotamer as ours_rot

    rrot = ref.geometry.rotamer
    rng = np.random.default_rng(71)
    bounds = [0, 120, 240, 360]
    angles = rng.random((300, 6)) * 359.9
    dev = np.asarray(ours_rot.rotamers_device(angles, bounds, 15))
    for j in range(6):
        t = rrot._rotamers(angles[:, j], bounds, 15)
        assert_array_equal(dev[:, j], np.asarray(t))


def test_synthetic_ensemble_fuzz(ref):
    from enspara_tpu.msm import synthetic_data as ours_syn

    rsyn = ref.msm.synthetic_data
    rng = np.random.default_rng(73)
    for trial in range(4):
        n = 5
        T = rng.random((n, n)) + 0.1
        T = T / T.sum(axis=1, keepdims=True)
        p0 = rng.random(n); p0 = p0 / p0.sum()
        op, oobs = ours_syn.synthetic_ensemble(T, p0, n_steps=20)
        tp, tobs = rsyn.synthetic_ensemble(T, p0, n_steps=20)
        assert_allclose(op, tp, rtol=1e-10)
        assert_allclose(oobs, tobs, rtol=1e-10)
        obs = rng.random(n)
        op2, oo = ours_syn.synthetic_ensemble(T, p0, n_steps=20,
                                              observable_per_state=obs)
        tp2, tt = rsyn.synthetic_ensemble(T, p0, n_steps=20,
                                          observable_per_state=obs)
        assert_allclose(np.asarray(oo), np.asarray(tt), rtol=1e-10)


def test_exposons_from_sasas_fuzz(ref):
    from enspara_tpu.info_theory import exposons as ours_exp

    rexp = ref.info_theory.exposons
    rng = np.random.default_rng(79)
    for trial in range(3):
        T, S = 200, 8
        # correlated exposure blocks so AP finds real structure
        base = rng.random((T, 2)) > 0.5
        sasas = np.zeros((T, S))
        sasas[:, :4] = base[:, [0]] * (0.5 + rng.random((T, 4)) * 0.1)
        sasas[:, 4:] = base[:, [1]] * (0.5 + rng.random((T, 4)) * 0.1)
        w = np.full(T, 1.0 / T)
        omi, oass = ours_exp.exposons_from_sasas(sasas, 0.9, w, 0.2)
        tmi, tass = rexp.exposons_from_sasas(sasas, 0.9, w, 0.2)
        assert_allclose(np.asarray(omi), np.asarray(tmi),
                        rtol=1e-4, atol=1e-7)
        assert_array_equal(np.asarray(oass), np.asarray(tass))


def test_msm_estimator_fit_parity(ref):
    from enspara_tpu.msm import MSM as OursMSM
    from enspara_tpu.msm import builders as ours_b

    RefMSM = ref.msm.msm.MSM
    ref_b = ref.msm.builders
    rng = np.random.default_rng(83)
    assigns = rng.integers(0, 5, size=(3, 150))

    for ob, tb in ((ours_b.normalize, ref_b.normalize),
                   (ours_b.transpose, ref_b.transpose)):
        for trim in (False, True):
            ours = OursMSM(lag_time=2, method=ob, trim=trim)
            ours.fit(assigns)
            theirs = RefMSM(lag_time=2, method=tb, trim=trim)
            theirs.fit(assigns)
            import scipy.sparse as sp

            def dense(x):
                return np.asarray(x.todense() if sp.issparse(x) else x)

            assert_array_equal(dense(ours.tcounts_),
                               dense(theirs.tcounts_))
            assert_allclose(dense(ours.tprobs_), dense(theirs.tprobs_),
                            rtol=1e-10)
            assert_allclose(np.asarray(ours.eq_probs_),
                            np.asarray(theirs.eq_probs_), rtol=1e-8)
            if trim:
                assert ours.mapping_.to_mapped == \
                    theirs.mapping_.to_mapped
