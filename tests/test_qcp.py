"""QCP RMSD kernel validation against a float64 Kabsch/SVD oracle."""

import numpy as np
from numpy.testing import assert_allclose

from enspara_tpu.ops import qcp


def random_structs(rng, n_structs, n_atoms, scale=1.0):
    return (rng.normal(size=(n_structs, n_atoms, 3)) * scale) \
        .astype(np.float32)


def rotate(xyz, rng):
    """Apply a random proper rotation + translation."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    return xyz @ R.T + rng.normal(size=3)


def test_rmsd_zero_for_rotated_copy():
    rng = np.random.default_rng(0)
    A = random_structs(rng, 1, 50)[0]
    B = rotate(A, rng).astype(np.float32)
    d = np.asarray(qcp.rmsd(A[None], B))
    assert d.shape == (1,)
    assert d[0] < 5e-3  # fp32 kernel; oracle value is 0


def test_rmsd_matches_kabsch_oracle():
    rng = np.random.default_rng(1)
    frames = random_structs(rng, 12, 37)
    refs = random_structs(rng, 5, 37)
    got = np.asarray(qcp.rmsd(frames, refs))
    assert got.shape == (12, 5)
    for i in range(12):
        for j in range(5):
            want = qcp.kabsch_rmsd_np(frames[i], refs[j])
            assert_allclose(got[i, j], want, rtol=1e-4, atol=1e-4)


def test_rmsd_vector_path():
    rng = np.random.default_rng(2)
    frames = random_structs(rng, 20, 33)
    ref = random_structs(rng, 1, 33)[0]
    got = np.asarray(qcp.rmsd(frames, ref))
    want = np.array([qcp.kabsch_rmsd_np(f, ref) for f in frames])
    assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rmsd_similar_structures():
    """Small perturbations — the numerically delicate regime."""
    rng = np.random.default_rng(3)
    A = random_structs(rng, 1, 64)[0]
    perturbed = np.stack([
        rotate(A + rng.normal(size=A.shape) * eps, rng)
        for eps in (1e-3, 1e-2, 0.1)]).astype(np.float32)
    got = np.asarray(qcp.rmsd(perturbed, A))
    want = np.array([qcp.kabsch_rmsd_np(p, A) for p in perturbed])
    # fp32 cancellation bounds absolute accuracy near rmsd=0 (same
    # regime as mdtraj's fp32 QCP kernel)
    assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_atom_padding_is_exact():
    rng = np.random.default_rng(4)
    frames = random_structs(rng, 6, 30)
    refs = random_structs(rng, 3, 30)
    plain = np.asarray(qcp.rmsd(frames, refs))
    fc, gf, n = qcp.prepare_structures(frames, n_atoms_pad=64)
    rc, gr, _ = qcp.prepare_structures(refs, n_atoms_pad=64)
    padded = np.asarray(qcp.qcp_rmsd_matrix(fc, rc, gf, gr, n_atoms=n))
    assert_allclose(plain, padded, rtol=1e-5, atol=1e-6)


def test_precentered_flag():
    rng = np.random.default_rng(5)
    frames = random_structs(rng, 4, 25)
    refs = random_structs(rng, 2, 25)
    fc, _ = qcp.center_coordinates(frames)
    rc, _ = qcp.center_coordinates(refs)
    a = np.asarray(qcp.rmsd(frames, refs))
    b = np.asarray(qcp.rmsd(np.asarray(fc), np.asarray(rc),
                            precentered=True))
    assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_degenerate_zero_g_structures():
    """All-identical / single-atom structures have G = 0 exactly; the
    lam0-scaled quartic coefficients must not overflow to NaN in fp32
    (regression: 1/max(lam0, 1e-30) ** 4 -> inf, 0 * inf -> NaN)."""
    import jax.numpy as jnp
    from enspara_tpu.ops import qcp

    X = np.zeros((6, 1, 3), np.float32)
    g = np.zeros(6, np.float32)
    d = np.asarray(qcp.qcp_rmsd_matrix(
        jnp.asarray(X), jnp.asarray(X[:2]),
        jnp.asarray(g), jnp.asarray(g[:2])))
    assert np.all(np.isfinite(d))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)

    Sc = tuple(jnp.zeros((1, 4)) for _ in range(9))
    out = np.asarray(qcp.rmsd_from_S_components_unrolled(
        Sc, jnp.zeros((1, 4)), 1.0))
    assert np.all(np.isfinite(out))
