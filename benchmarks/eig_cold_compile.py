#!/usr/bin/env python
"""Cold-compile cost of the filtered device eigensolver, and the
cross-dataset persistent-cache hit that shape bucketing buys.

Protocol (all on whatever device backend is default):
1. link probe: one tiny matmul, timed — if the dev tunnel is stalled
   this poisons every wall-clock below, so the artifact records it;
2. dataset A (100k states), FRESH compile-cache dir: time the first
   filtered eigsolve (true cold: compile + run), then the warm solve;
3. dataset B (a DIFFERENT chain: different seed, block count, nnz,
   and state count in the same bucket), SAME cache dir, NEW process
   would be ideal but same-process jit cache is keyed by shape too —
   so instead B is solved after clearing jax's in-memory caches,
   leaving only the persistent cache: the bucketed shapes collide, so
   B's "cold" should cost cache-load + run, not compile.

Writes benchmarks/eig-cold-<backend>-result.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _dataset(n, blocks, seed):
    import scipy.sparse

    from enspara_tpu.msm import builders
    from enspara_tpu.msm.synthetic_data import sparse_metastable_counts

    C = sparse_metastable_counts(n, n_blocks=blocks, seed=seed)
    _, T, pi = builders.transpose(C)
    return scipy.sparse.csr_matrix(T), np.asarray(pi)


def _solve(T, pi, k=21):
    from enspara_tpu.msm.eigen_device import eigenspectrum_reversible
    t0 = time.perf_counter()
    vals, vecs, info = eigenspectrum_reversible(
        T, pi=pi, n_eigs=k, method='filtered', return_info=True)
    dt = time.perf_counter() - t0
    return dt, vals, info


def main():
    cache = os.environ.get('ENSPARA_TPU_CACHE_DIR')
    assert cache, 'run with ENSPARA_TPU_CACHE_DIR=<fresh dir>'
    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    out = {'backend': jax.default_backend(),
           'device': str(jax.devices()[0]),
           'jax_version': jax.__version__,
           'cache_dir': cache,
           'timestamp_source': 'end-of-run wall clock, written by '
                               'benchmarks/eig_cold_compile.py'}

    # 1. link probe
    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    np.asarray(x @ x)
    out['link_probe_s'] = round(time.perf_counter() - t0, 2)
    out['link_degraded'] = out['link_probe_s'] > 10.0

    # 2. dataset A, true cold
    T_a, pi_a = _dataset(100_000, 25, 11)
    cold_s, vals_a, info_a = _solve(T_a, pi_a)
    warm_s, vals_a2, _ = _solve(T_a, pi_a)
    out['dataset_a'] = {
        'n_states': 100_000, 'nnz': int(T_a.nnz),
        'cold_s': round(cold_s, 2), 'warm_s': round(warm_s, 2),
        'max_residual': float(np.max(info_a['residuals'])),
        'fallback': bool(info_a['fallback']),
    }
    print(out['dataset_a'], flush=True)

    # 3. dataset B: different chain, same shape bucket. Drop the
    # in-memory executable caches so only the persistent cache can
    # shortcut the compile.
    from enspara_tpu.msm import eigen_device as _ed
    from enspara_tpu.ops import sparse as _sp
    _ed._filter_sweep_fn.cache_clear()
    _sp._ell_spmm_fn.cache_clear()
    jax.clear_caches()

    # 101,000 states / 28 blocks / seed 3 pads into the SAME (n, w)
    # bucket as dataset A — (106496, 40) for both — so this solve must
    # hit the identical compiled program; ASSERTED via the solver's
    # own bucket identity, not assumed (an earlier pick landed in a
    # different w bucket and the check caught the bogus claim)
    from enspara_tpu.msm.eigen_device import bucketed_ell_shape
    T_b, pi_b = _dataset(101_000, 28, 3)
    shape_a = bucketed_ell_shape(
        T_a.shape[0], int(np.diff(T_a.indptr).max()))
    shape_b = bucketed_ell_shape(
        T_b.shape[0], int(np.diff(T_b.indptr).max()))
    out['bucketed_shapes'] = {'dataset_a': list(shape_a),
                              'dataset_b': list(shape_b),
                              'same_program': shape_a == shape_b}
    coldb_s, vals_b, info_b = _solve(T_b, pi_b)
    out['dataset_b'] = {
        'n_states': 101_000, 'n_blocks': 28, 'nnz': int(T_b.nnz),
        'cold_from_persistent_cache_s': round(coldb_s, 2),
        'max_residual': float(np.max(info_b['residuals'])),
        'fallback': bool(info_b['fallback']),
    }
    print(out['dataset_b'], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'eig-cold-%s-result.json' % jax.default_backend())
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
