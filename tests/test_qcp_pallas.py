"""Fused Pallas QCP kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
from numpy.testing import assert_allclose

from enspara_tpu.ops import qcp
from enspara_tpu.ops.qcp_pallas import qcp_rmsd_matrix_pallas


def test_pallas_matches_xla_small():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(40, 30, 3)).astype(np.float32)
    centers = rng.normal(size=(12, 30, 3)).astype(np.float32)
    fc, gf = qcp.center_coordinates(frames)
    cc, gc = qcp.center_coordinates(centers)
    xla = np.asarray(qcp.qcp_rmsd_matrix(fc, cc, gf, gc))
    pal = np.asarray(qcp_rmsd_matrix_pallas(fc, cc, gf, gc,
                                            interpret=True))
    assert pal.shape == (40, 12)
    assert_allclose(pal, xla, atol=2e-3)


def test_pallas_padding_is_exact():
    """Atom / frame / center padding must not contaminate results."""
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(17, 23, 3)).astype(np.float32)
    centers = rng.normal(size=(5, 23, 3)).astype(np.float32)
    fc, gf = qcp.center_coordinates(frames)
    cc, gc = qcp.center_coordinates(centers)
    pal = np.asarray(qcp_rmsd_matrix_pallas(fc, cc, gf, gc,
                                            interpret=True))
    want = np.array([[qcp.kabsch_rmsd_np(np.asarray(fc)[i],
                                         np.asarray(cc)[j])
                      for j in range(5)] for i in range(17)])
    assert_allclose(pal, want, atol=2e-3)
