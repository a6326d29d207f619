"""TPT pathway + net-flux fuzz vs the live reference
(tests/_reference_oracle.py): the CSR pathway engine
(enspara_tpu/tpt/path.py) must reproduce the reference's densified
Dijkstra (reference tpt/path.py:46-250) path-for-path, and the CSR
net-flux clipping must equal the reference's dense boolean masking
(reference tpt/tpt.py:94+)."""

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
    importlib.import_module('enspara.tpt')
    return pkg


def _random_flux_graph(rng, n, density=0.05):
    """Random nonnegative sparse 'net flux' with a guaranteed
    source->sink backbone so a path always exists."""
    m = scipy.sparse.random(n, n, density=density, random_state=rng,
                            data_rvs=lambda k: rng.random(k))
    m = m.tolil()
    m.setdiag(0)
    # backbone 0 -> 1 -> ... -> n-1 with random positive flux
    for i in range(n - 1):
        m[i, i + 1] = max(m[i, i + 1], rng.random() + 1e-3)
    return m.tocsr()


def test_top_path_fuzz(ref):
    from enspara_tpu.tpt import top_path

    rng = np.random.RandomState(5)
    for trial in range(20):
        n = rng.randint(8, 120)
        net = _random_flux_graph(rng, n, density=rng.uniform(.02, .3))
        sources = [0] if trial % 2 else [0, rng.randint(1, n - 1)]
        sinks = [n - 1]
        o_path, o_flux = top_path(sources, sinks, net)
        r_path, r_flux = ref.tpt.top_path(sources, sinks,
                                          net.toarray())
        assert_array_equal(o_path, r_path, 'trial %d' % trial)
        assert_allclose(o_flux, r_flux, err_msg='trial %d' % trial)


@pytest.mark.parametrize('scheme', ['subtract', 'bottleneck'])
def test_paths_fuzz(ref, scheme):
    from enspara_tpu.tpt import paths

    rng = np.random.RandomState(11)
    for trial in range(10):
        n = rng.randint(10, 80)
        net = _random_flux_graph(rng, n, density=0.15)
        o_paths, o_fluxes = paths([0], [n - 1], net,
                                  remove_path=scheme, num_paths=8)
        r_paths, r_fluxes = ref.tpt.paths([0], [n - 1], net.toarray(),
                                          remove_path=scheme,
                                          num_paths=8)
        assert len(o_paths) == len(r_paths), 'trial %d' % trial
        for op, rp in zip(o_paths, r_paths):
            assert_array_equal(op, rp, 'trial %d' % trial)
        assert_allclose(o_fluxes, r_fluxes, err_msg='trial %d' % trial)


def test_paths_sparse_dense_agree():
    """Named-scheme CSR engine == custom-callable dense engine (the
    dense remover functions passed as callables force the dense path)."""
    from enspara_tpu.tpt import paths
    from enspara_tpu.tpt.path import (_remove_bottleneck,
                                      _subtract_path_flux)

    rng = np.random.RandomState(23)
    net = _random_flux_graph(rng, 60, density=0.2)
    for scheme, fn in (('subtract', _subtract_path_flux),
                       ('bottleneck', _remove_bottleneck)):
        sp, sf = paths([0], [59], net, remove_path=scheme, num_paths=6)
        dp, df = paths([0], [59], net, remove_path=fn, num_paths=6)
        assert len(sp) == len(dp)
        for a, b in zip(sp, dp):
            assert_array_equal(a, b)
        assert_allclose(sf, df)


def test_net_fluxes_fuzz(ref):
    from enspara_tpu.tpt import net_fluxes

    rng = np.random.RandomState(7)
    for trial in range(6):
        n = rng.randint(8, 40)
        C = rng.randint(1, 10, size=(n, n)).astype(float)
        T = C / C.sum(axis=1)[:, None]
        pops = np.full(n, 1.0 / n)
        sources, sinks = [0], [n - 1]
        o_sparse = net_fluxes(scipy.sparse.csr_matrix(T), sources,
                              sinks, populations=pops)
        o_dense = net_fluxes(T, sources, sinks, populations=pops)
        r = ref.tpt.net_fluxes(T, sources, sinks, populations=pops)
        assert scipy.sparse.issparse(o_sparse)
        assert_allclose(o_sparse.toarray(), np.asarray(r),
                        atol=1e-12, err_msg='trial %d' % trial)
        assert_allclose(np.asarray(o_dense), np.asarray(r),
                        atol=1e-12, err_msg='trial %d' % trial)
