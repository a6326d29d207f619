"""smFRET stack tests.

Deterministic oracles from the reference suite (test_smfret.py:38-60):
dye spectral parameters (J, QD, Td) and the clash-pruned dye-MSM shape
are reproduced exactly. The seeded Monte-carlo trajectories diverge
from the reference's exact values (float32 mdtraj superpose vs float64
Kabsch here), so the MC is validated statistically: outcome fractions,
lifetime shortening by FRET, and the non-radiative fraction ~ (1-Qd).
"""

import os

import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_allclose

from enspara_tpu import io

FRET_DATA = '/root/reference/enspara/test/fret_data'
DYE_DIR = '/root/reference/enspara/data/dyes'
HAVE_DATA = os.path.isdir(FRET_DATA) and os.path.isdir(DYE_DIR)

pytestmark = pytest.mark.skipif(not HAVE_DATA,
                                reason='fret data not present')

DONOR = 'AlexaFluor 488 C1R'
ACCEPTOR = 'AlexaFluor 594 C1R'


def get_fn(fn):
    return os.path.join(FRET_DATA, fn)


@pytest.fixture(scope='module')
def fret_system():
    from enspara_tpu.geometry import explicit_r0_calc as r0c

    prot = io.load(get_fn('ab40.xtc'), top=get_fn('ab40.pdb'))
    donor = io.load(get_fn('a48-c1r-mini.xtc'),
                    top=get_fn('a48-c1r.pdb'))
    acceptor = io.load(get_fn('a59-c1r-mini.xtc'),
                       top=get_fn('a59-c1r.pdb'))
    return {
        'prot': prot,
        'donor': donor,
        'acceptor': acceptor,
        'd_tcounts': np.load(get_fn('a48-tcounts.npy')),
        'a_tcounts': np.load(get_fn('a59-tcounts.npy')),
        'lib': r0c.load_library(),
        'params': r0c.get_dye_overlap(DONOR, ACCEPTOR),
    }


def test_dye_overlap_oracle(fret_system):
    J, Qd, Td = fret_system['params']
    assert_almost_equal(J, 2416847646975772)
    assert_almost_equal(Qd[0], 0.92)
    assert_almost_equal(Td[0], 4.1)


def test_labeling_oracle(fret_system):
    from enspara_tpu.geometry import dye_lifetimes

    d_tprobs, d_eqs, d_indxs = dye_lifetimes.make_dye_msm(
        fret_system['donor'], fret_system['d_tcounts'],
        fret_system['prot'][0], 1, DONOR, fret_system['lib'],
        center_n=0)
    # 75/100 donor dye states clash at this site (reference oracle)
    assert len(d_indxs) == 25
    assert d_tprobs.shape == (100, 100)
    assert_almost_equal(d_tprobs.sum(), 25)


def test_calc_R0_and_rates():
    from enspara_tpu.geometry import explicit_r0_calc as r0c
    from enspara_tpu.geometry import dye_lifetimes as dl

    # R0 for typical parameters lands in the ~5 nm range
    R0 = r0c.calc_R0(2 / 3, 0.92, 2.4e15)
    assert 4.0 < R0 < 7.0
    # FRET rate at r = R0 equals 1/Td
    assert_allclose(dl.FRET_rate(R0, R0, 4.1), 1 / 4.1)
    krad, knr = dl.calc_dye_radiative_rates(0.92, 4.1)
    assert_allclose(krad + knr, 1 / 4.1)
    probs = dl.calc_energy_transfer_prob(krad, knr, 0.1, 0.002)
    assert_allclose(probs.sum(), 1.0)
    assert (probs >= 0).all()


def test_k2_geometry():
    from enspara_tpu.geometry.explicit_r0_calc import calc_k2_r

    # parallel dipoles perpendicular to the separation vector: k2 = 1
    D = np.array([0, 0, 0, 0, 0, 0, 0, 0, 1.0])
    A = np.array([2, 0, 0, 2, 0, 0, 0, 0, 1.0])
    k2, r = calc_k2_r(D, A)
    assert_allclose(k2, 1.0, atol=1e-12)
    assert_allclose(r, 2.0)
    # collinear dipoles along the separation vector: k2 = 4
    D = np.array([0, 0, 0, 0, 0, 0, 1.0, 0, 0])
    A = np.array([2, 0, 0, 2, 0, 0, 1.0, 0, 0])
    k2, r = calc_k2_r(D, A)
    assert_allclose(k2, 4.0, atol=1e-12)
    # perpendicular dipoles, one along r: k2 = 0
    D = np.array([0, 0, 0, 0, 0, 0, 0, 1.0, 0])
    A = np.array([2, 0, 0, 2, 0, 0, 1.0, 0, 0])
    k2, r = calc_k2_r(D, A)
    assert_allclose(k2, 0.0, atol=1e-12)


@pytest.mark.slow
def test_mc_statistics(fret_system):
    from enspara_tpu.geometry import dye_lifetimes

    d_tp, d_eq, _ = dye_lifetimes.make_dye_msm(
        fret_system['donor'], fret_system['d_tcounts'],
        fret_system['prot'][0], 1, DONOR, fret_system['lib'])
    a_tp, a_eq, _ = dye_lifetimes.make_dye_msm(
        fret_system['acceptor'], fret_system['a_tcounts'],
        fret_system['prot'][0], 40, ACCEPTOR, fret_system['lib'])

    events = [dye_lifetimes.resolve_excitation(
        DONOR, ACCEPTOR, d_tp, a_tp, d_eq, a_eq,
        fret_system['donor'], fret_system['acceptor'],
        fret_system['params'], 0.002, fret_system['lib'], rng_seed=i)
        for i in range(400)]
    outcomes = np.array([e[1] for e in events])
    steps = np.array([e[0] for e in events])

    J, Qd, Td = fret_system['params']
    # non-radiative fraction ~ (1 - Qd) among non-transfer events
    nonrad = (outcomes == 'non_radiative').mean()
    assert 0.02 < nonrad < 0.15
    # donor lifetime shortened below Td by FRET
    assert steps.mean() * 0.002 < Td[0]
    # all three outcomes observed
    assert set(outcomes) == {'radiative', 'non_radiative',
                             'energy_transfer'}


@pytest.mark.slow
def test_mc_device_matches_host_statistics(fret_system):
    """The lockstep device MC reproduces the host per-photon MC's
    outcome distribution and mean lifetime (different PRNGs, same
    physics)."""
    from enspara_tpu.geometry import dye_lifetimes

    d_tp, d_eq, _ = dye_lifetimes.make_dye_msm(
        fret_system['donor'], fret_system['d_tcounts'],
        fret_system['prot'][0], 1, DONOR, fret_system['lib'])
    a_tp, a_eq, _ = dye_lifetimes.make_dye_msm(
        fret_system['acceptor'], fret_system['a_tcounts'],
        fret_system['prot'][0], 40, ACCEPTOR, fret_system['lib'])

    host = [dye_lifetimes.resolve_excitation(
        DONOR, ACCEPTOR, d_tp, a_tp, d_eq, a_eq,
        fret_system['donor'], fret_system['acceptor'],
        fret_system['params'], 0.002, fret_system['lib'], rng_seed=i)
        for i in range(500)]
    h_steps = np.array([e[0] for e in host])
    h_out = np.array([e[1] for e in host])

    d_steps, d_out = dye_lifetimes.resolve_excitations_device(
        DONOR, ACCEPTOR, d_tp, a_tp, d_eq, a_eq,
        fret_system['donor'], fret_system['acceptor'],
        fret_system['params'], 0.002, fret_system['lib'],
        n_samples=500, rng_seed=7)

    assert len(d_steps) == 500
    assert not (d_out == 'excited').any()
    # mean lifetime within 15% (MC noise at n=500)
    assert abs(d_steps.mean() - h_steps.mean()) < 0.15 * h_steps.mean()
    # outcome channel fractions within 10 percentage points
    for ch in ('radiative', 'non_radiative', 'energy_transfer'):
        assert abs((d_out == ch).mean() - (h_out == ch).mean()) < 0.10


def test_calc_lifetimes_and_burst(fret_system, tmp_path):
    from enspara_tpu.geometry import dye_lifetimes

    lifetimes, outcomes = dye_lifetimes.calc_lifetimes(
        (fret_system['prot'][0], 0),
        fret_system['donor'], fret_system['d_tcounts'],
        fret_system['acceptor'], fret_system['a_tcounts'],
        [1, 40], [DONOR, ACCEPTOR], dye_lagtime=0.002, n_samples=20,
        rng_seed=0)
    assert len(lifetimes) == 20
    assert len(outcomes) == 20
    assert (lifetimes >= 0).all()

    # static and isotropic treatments run too
    for treatment in ('static', 'isotropic'):
        lt, oc = dye_lifetimes.calc_lifetimes(
            (fret_system['prot'][0], 0),
            fret_system['donor'], fret_system['d_tcounts'],
            fret_system['acceptor'], fret_system['a_tcounts'],
            [1, 40], [DONOR, ACCEPTOR], dye_lagtime=0.002,
            n_samples=10, dye_treatment=treatment, rng_seed=0)
        assert len(lt) == 10


def test_sample_lifetimes_guaranteed_photon():
    from enspara_tpu.geometry import dye_lifetimes

    lifetimes = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    outcomes = np.array(
        [['radiative', 'energy_transfer', 'non_radiative'],
         ['energy_transfer', 'energy_transfer', 'radiative']],
        dtype=object)
    photons, lts = dye_lifetimes._sample_lifetimes_guarenteed_photon(
        np.array([0, 1, 0, 1]), lifetimes, outcomes, rng_seed=3)
    assert len(photons) == 4
    assert set(photons) <= {0, 1}
    # no lifetime from a non_radiative event may appear
    assert 0.3 not in lts


def test_lifetime_fitting():
    from enspara_tpu.geometry import dye_lifetimes

    rng = np.random.default_rng(0)
    lifetimes = rng.exponential(4.0, size=20000)
    t, counts, I0, tau = dye_lifetimes.fit_lifetimes_single_exp(
        lifetimes)
    assert abs(tau - 4.0) < 0.3
    t, counts, I1, I2, tau1, tau2 = \
        dye_lifetimes.fit_lifetimes_double_exp(lifetimes)
    assert min(abs(tau1 - 4.0), abs(tau2 - 4.0)) < 1.0


def test_point_cloud_pipeline(fret_system):
    """dyes_from_expt_dist: distance distributions + burst sampling."""
    from enspara_tpu.geometry import dyes_from_expt_dist as dyefs

    prot = fret_system['prot']
    # use small synthetic clouds around two residues
    rng = np.random.default_rng(0)
    cloud = io.Trajectory(
        (rng.random((1, 200, 3)).astype(np.float32) - 0.5) * 0.8,
        None)

    probs, bin_edges = dyefs.dye_distance_distribution(
        prot[:3], cloud, cloud, [1, 40], n_procs=2)
    assert len(probs) == 3
    dist_distribution = dyefs.make_distribution(probs, bin_edges)

    T = np.load(get_fn('ab40-tprobs.npy'))
    if T.shape[0] != len(probs):
        # build a tiny uniform MSM over the 3 frames instead
        T = np.full((3, 3), 1 / 3.)
    pops = np.full(len(T), 1 / len(T))

    MSM_frames = [np.array([2, 5, 9]), np.array([1, 4, 12])]
    FEs, trajs = dyefs.sample_FRET_histograms(
        T, pops, dist_distribution, MSM_frames, R0=5.4, n_procs=2,
        random_state=0)
    assert FEs.shape == (2, 2)
    assert all(0 <= fe <= 1 for fe in FEs[:, 0])


def test_fret_efficiency_and_helpers():
    from enspara_tpu.geometry import dyes_from_expt_dist as dyefs

    assert_allclose(dyefs.FRET_efficiency(5.4, 5.4), 0.5)
    assert dyefs.FRET_efficiency(1.0, 5.4) > 0.99
    assert dyefs.FRET_efficiency(20.0, 5.4) < 0.01

    frames = dyefs.convert_photon_times([[1.0, 2.0]], 10.0, 10)
    np.testing.assert_array_equal(frames[0], [10, 30])

    data = np.array([[0.1, 5], [0.3, 10], [0.5, 5]])
    rebuilt = dyefs.remake_data_from_hist(data,
                                          np.random.default_rng(0))
    assert len(rebuilt) == 20
    m = dyefs.calc_4_moments(rebuilt)
    assert m.shape == (4, 1)


def test_guaranteed_photon_rejects_all_nonradiative():
    """A state with only non-radiative events must raise instead of
    spinning the redraw loop forever (r5 review; the reference
    hangs)."""
    from enspara_tpu.exception import DataInvalid
    from enspara_tpu.geometry.dye_lifetimes import \
        _sample_lifetimes_guarenteed_photon

    lifetimes = {0: [1.0, 2.0]}
    outcomes = {0: ['non_radiative', 'non_radiative']}
    with pytest.raises(DataInvalid, match='non-radiative'):
        _sample_lifetimes_guarenteed_photon([0], lifetimes, outcomes,
                                            rng_seed=1)
