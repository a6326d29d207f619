"""App-level tests for the `enspara` dispatcher and the smFRET CLIs —
the real mains run against the reference's bundled mini dye/protein
systems in temp dirs (mirroring the reference's app-test strategy,
SURVEY.md §4). The library stack under these apps has its own oracle
tests in tests/test_smfret.py; here we exercise the CLI surface:
argument parsing, file I/O wiring, and output layout."""

import os

import numpy as np
import pytest

REF_DATA = '/root/reference/enspara/test/data'
FRET_DATA = '/root/reference/enspara/test/fret_data'
HAVE_REF = os.path.isdir(REF_DATA) and os.path.isdir(FRET_DATA)

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference data not present')

DONOR = 'AlexaFluor 488 C1R'
ACCEPTOR = 'AlexaFluor 594 C1R'


def fret_fn(fn):
    return os.path.join(FRET_DATA, fn)


def test_dispatcher_identify_and_route():
    from enspara_tpu.apps import main as dispatcher

    args = dispatcher.identify_app(['enspara', 'cluster', '--help'])
    from enspara_tpu.apps.cluster import main as cluster_main
    assert args.main is cluster_main
    assert args.appargs == ['--help']

    for name, module in (('implied', 'implied_timescales'),
                         ('reassign', 'reassign'),
                         ('cards', 'collect_cards'),
                         ('entropy', 'shannon_entropy')):
        args = dispatcher.identify_app(['enspara', name])
        mod = __import__('enspara_tpu.apps.' + module,
                         fromlist=['main'])
        assert args.main is mod.main

    with pytest.raises(SystemExit):
        dispatcher.identify_app(['enspara', 'not-an-app'])


def test_dispatcher_end_to_end_cluster(tmp_path):
    """`enspara cluster ...` through the dispatcher produces the same
    outputs as calling the app main directly."""
    from enspara_tpu.apps import main as dispatcher

    xtc = os.path.join(REF_DATA, 'frame0.xtc')
    top = os.path.join(REF_DATA, 'native.pdb')
    distances = str(tmp_path / 'd.h5')
    assignments = str(tmp_path / 'a.h5')

    rc = dispatcher.main(
        ['enspara', 'cluster',
         '--trajectories', xtc, '--topology', top,
         '--algorithm', 'kcenters', '--cluster-number', '3',
         '--atoms', 'name CA or name C or name N',
         '--distances', distances, '--assignments', assignments,
         '--center-features', str(tmp_path / 'c.pkl'),
         '--center-indices', str(tmp_path / 'ci.npy')])
    assert rc == 0

    from enspara_tpu import ra
    assigns = ra.load(assignments)
    assert int(np.max(assigns[0])) == 2


@pytest.fixture(scope='module')
def lifetimes_outdir(tmp_path_factory):
    """Run `smFRET_dye_MC calc_lifetimes` once on the mini system."""
    from enspara_tpu.apps import smFRET_dye_MC as app

    outdir = str(tmp_path_factory.mktemp('lifetimes'))
    pairs = os.path.join(outdir, 'pairs.txt')
    np.savetxt(pairs, np.array([[1, 40]]), fmt='%d')

    rc = app.main(
        ['smFRET', 'calc_lifetimes',
         '--donor_name', DONOR,
         '--donor_centers', fret_fn('a48-c1r-mini.xtc'),
         '--donor_top', fret_fn('a48-c1r.pdb'),
         '--donor_tcounts', fret_fn('a48-tcounts.npy'),
         '--acceptor_name', ACCEPTOR,
         '--acceptor_centers', fret_fn('a59-c1r-mini.xtc'),
         '--acceptor_top', fret_fn('a59-c1r.pdb'),
         '--acceptor_tcounts', fret_fn('a59-tcounts.npy'),
         '--dye_lagtime', '0.002',
         '--prot_top', fret_fn('ab40.pdb'),
         '--prot_centers', fret_fn('ab40.xtc'),
         '--resid_pairs', pairs,
         '--n_samples', '8',
         '--rng_seed', '0',
         '--output_dir', outdir])
    assert rc == 0
    return outdir


def test_smfret_calc_lifetimes_cli(lifetimes_outdir):
    from enspara_tpu import io

    n_prot = len(io.load(fret_fn('ab40.xtc'), top=fret_fn('ab40.pdb')))
    events = np.load(os.path.join(lifetimes_outdir, 'events-1-40.npy'),
                     allow_pickle=True)
    # one (lifetimes, outcomes) event pair per protein center
    assert events.shape[0] == n_prot
    assert events.shape[1] == 2
    # every recorded outcome is one of the physical relaxation channels
    for lifets, outcomes in events:
        assert len(lifets) == len(outcomes)
        assert set(np.unique(outcomes)) <= {
            'radiative', 'non_radiative', 'energy_transfer'}


def test_smfret_run_burst_cli(lifetimes_outdir):
    """`run_burst` consumes calc_lifetimes' event files and writes the
    FE / lifetime / MSM output tree."""
    from enspara_tpu.apps import smFRET_dye_MC as app

    outdir = lifetimes_outdir
    tprobs = np.load(fret_fn('ab40-tprobs.npy'))
    n = len(tprobs)
    tcounts = os.path.join(outdir, 'tcounts.npy')
    np.save(tcounts, tprobs * 100.0)
    eqs = os.path.join(outdir, 'eqs.npy')
    np.save(eqs, np.full(n, 1.0 / n))

    # synthetic interphoton times: a few bursts of exponential gaps
    rng = np.random.default_rng(0)
    photon_times = os.path.join(outdir, 'photons.npy')
    np.save(photon_times,
            np.array([rng.exponential(1e4, size=rng.integers(5, 12))
                      for _ in range(6)], dtype='O'),
            allow_pickle=True)

    rc = app.main(
        ['smFRET', 'run_burst',
         '--eq_probs', eqs,
         '--t_counts', tcounts,
         '--lifetimes_dir', outdir,
         '--donor_name', DONOR,
         '--acceptor_name', ACCEPTOR,
         '--lagtime', '4',
         '--resid_pairs', os.path.join(outdir, 'pairs.txt'),
         '--photon_times', photon_times,
         '--correction_factor', '1000',
         '--output_dir', outdir])
    assert rc == 0

    base = '1-%s-40-%s' % (''.join(DONOR.split(' ')),
                           ''.join(ACCEPTOR.split(' ')))
    assert os.path.exists(
        os.path.join(outdir, 'MSMs', base + '-t_prbs.npy'))
    fes = np.load(os.path.join(outdir, 'FEs', 'FE-1-40-1000.npy'),
                  allow_pickle=True)
    assert len(fes) == 6
    d_lt = np.load(os.path.join(
        outdir, 'Lifetimes', 'd_lifetimes-1-40-1000.npy'),
        allow_pickle=True)
    assert len(d_lt) == 6


@pytest.fixture(scope='module')
def point_cloud_outdir(tmp_path_factory):
    """Run `smFRET_point_clouds model_dyes` once on the mini system."""
    from enspara_tpu.apps import smFRET_point_clouds as app

    outdir = str(tmp_path_factory.mktemp('point_clouds'))
    pairs = os.path.join(outdir, 'pairs.txt')
    np.savetxt(pairs, np.array([[1, 40]]), fmt='%d')

    rc = app.main(
        ['smFRET_pc', 'model_dyes',
         fret_fn('ab40.xtc'), fret_fn('ab40.pdb'), pairs,
         '--output_dir', outdir])
    assert rc == 0
    return outdir


@pytest.mark.slow
def test_point_clouds_model_dyes_cli(point_cloud_outdir):
    from enspara_tpu import io, ra as ra_mod

    n_prot = len(io.load(fret_fn('ab40.xtc'), top=fret_fn('ab40.pdb')))
    probs = ra_mod.load(
        os.path.join(point_cloud_outdir, 'probs_1_40.h5'))
    edges = ra_mod.load(
        os.path.join(point_cloud_outdir, 'bin_edges_1_40.h5'))
    assert len(probs) == n_prot
    assert len(edges) == n_prot
    # per-state distance distributions are densities over the bins
    # (integrate to 1), or all-zero when every cloud position clashes
    for row, edge in zip(probs, edges):
        widths = np.diff(np.asarray(edge))
        mass = float(np.sum(np.asarray(row)[:len(widths)] * widths))
        assert mass == pytest.approx(1.0, abs=1e-3) or mass == 0.0


@pytest.mark.slow
def test_point_clouds_calc_fret_cli(point_cloud_outdir):
    from enspara_tpu.apps import smFRET_point_clouds as app

    outdir = point_cloud_outdir
    tprobs_f = fret_fn('ab40-tprobs.npy')
    n = len(np.load(tprobs_f))
    eqs = os.path.join(outdir, 'eqs.npy')
    np.save(eqs, np.full(n, 1.0 / n))

    rng = np.random.default_rng(1)
    photon_times = os.path.join(outdir, 'photons.npy')
    np.save(photon_times,
            np.array([rng.exponential(1e4, size=rng.integers(5, 12))
                      for _ in range(5)], dtype='O'),
            allow_pickle=True)

    rc = app.main(
        ['smFRET_pc', 'calc_FRET',
         eqs, tprobs_f, '4', outdir,
         os.path.join(outdir, 'pairs.txt'),
         '--photon_times', photon_times,
         '--time_factor', '100',
         '--output_dir', outdir])
    assert rc == 0

    fes = np.load(os.path.join(
        outdir, 'FRET_E_1_40_time_factor_100.npy'), allow_pickle=True)
    assert len(fes) == 5
    # each burst yields (FE, n_photon_std-chunk estimates) pairs with
    # efficiencies in [0, 1]
    vals = np.array([f[0] for f in fes], dtype=float)
    assert np.all((vals >= 0) & (vals <= 1))


def test_point_clouds_fit_fret_cli(tmp_path):
    """`fit_FRET` scores predicted FRET histograms against an
    experimental histogram across time factors. Self-contained (no
    model_dyes fixture) so the point-clouds app keeps fast-tier
    coverage."""
    from enspara_tpu.apps import smFRET_point_clouds as app

    outdir = str(tmp_path)
    np.savetxt(os.path.join(outdir, 'pairs.txt'),
               np.array([[1, 40]]), fmt='%d')
    # synthetic experimental histogram over FE in [0, 1]
    rng = np.random.default_rng(2)
    counts, edges = np.histogram(rng.uniform(0, 1, 500), bins=20,
                                 range=(0, 1))
    centers = 0.5 * (edges[:-1] + edges[1:])
    expt = os.path.join(outdir, 'expt.txt')
    np.savetxt(expt, np.column_stack([centers, counts]))

    # self-contained predicted histograms at two time factors (same
    # (n_bursts, 2) layout calc_FRET writes)
    pred_dir = os.path.join(outdir, 'pred')
    os.makedirs(pred_dir, exist_ok=True)
    for tf in (100, 1000):
        fes = np.empty((8, 2), dtype=object)
        for b in range(8):
            fes[b, 0] = rng.uniform(0, 1)
            fes[b, 1] = rng.uniform(0, 0.3)
        np.save(os.path.join(
            pred_dir, 'FRET_E_1_40_time_factor_%d.npy' % tf), fes,
            allow_pickle=True)

    conf = os.path.join(outdir, 'fit_conf.txt')
    with open(conf, 'w') as f:
        f.write('%s %s\n' % (expt, pred_dir))

    rc = app.main(
        ['smFRET_pc', 'fit_FRET', conf,
         os.path.join(outdir, 'pairs.txt'),
         '--method', 'sum_sq_residuals',
         '--output_dir', outdir])
    assert rc == 0

    outs = [f for f in os.listdir(outdir)
            if f.endswith('sum_sq_residuals.npy')]
    assert len(outs) == 1
    scores = np.load(os.path.join(outdir, outs[0]),
                     allow_pickle=True)
    # one (time_factor, score) row per predicted histogram file
    assert scores.shape == (2, 2)
    assert sorted(int(s) for s in scores[:, 0]) == [100, 1000]
    assert np.all(np.asarray(scores[:, 1], dtype=float) >= 0)
