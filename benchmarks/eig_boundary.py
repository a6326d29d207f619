#!/usr/bin/env python
"""Dispatch-boundary probe for the sparse eigensolver: filtered
device solver vs host ARPACK at 150k-300k states.

`eigenspectrum_reversible(method='auto')` concedes sparse spectra
past 3e5 states to host ARPACK on measured round-3 evidence. The
round-4 solver is faster (CholeskyQR3) — this re-measures the
crossover so the boundary rests on current numbers.

Writes benchmarks/eig-boundary-<backend>-result.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def one(n, blocks, k=21):
    import scipy.sparse

    from enspara_tpu.msm import builders
    from enspara_tpu.msm.eigen_device import eigenspectrum_reversible
    from enspara_tpu.msm.synthetic_data import sparse_metastable_counts

    C = sparse_metastable_counts(n, n_blocks=blocks, seed=11)
    _, T, pi = builders.transpose(C)
    T = scipy.sparse.csr_matrix(T)
    pi = np.asarray(pi)

    out = {'n_states': n, 'nnz': int(T.nnz)}

    # filtered device solver: first call (may compile), then warm
    t0 = time.perf_counter()
    v1, _, i1 = eigenspectrum_reversible(T, pi=pi, n_eigs=k,
                                         method='filtered',
                                         return_info=True)
    out['filtered_first_s'] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    v1, _, i1 = eigenspectrum_reversible(T, pi=pi, n_eigs=k,
                                         method='filtered',
                                         return_info=True)
    out['filtered_warm_s'] = round(time.perf_counter() - t0, 2)
    out['filtered_fallback'] = bool(i1['fallback'])
    out['filtered_max_residual'] = float(np.max(i1['residuals']))

    t0 = time.perf_counter()
    v2, _, i2 = eigenspectrum_reversible(T, pi=pi, n_eigs=k,
                                         method='arpack',
                                         return_info=True)
    out['arpack_host_s'] = round(time.perf_counter() - t0, 2)
    out['eigval_max_diff'] = float(np.abs(v1 - v2).max())
    print(out, flush=True)
    return out


def main():
    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    t0 = time.perf_counter()
    import jax.numpy as jnp
    np.asarray(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    probe_s = round(time.perf_counter() - t0, 2)

    points = [one(150_000, 30), one(200_000, 40), one(300_000, 50)]
    result = {
        'backend': jax.default_backend(),
        'device': str(jax.devices()[0]),
        'jax_version': jax.__version__,
        'link_probe_s': probe_s,
        'link_degraded': probe_s > 10.0,
        'timestamp_source': 'end-of-run wall clock, written by '
                            'benchmarks/eig_boundary.py',
        'points': points,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'eig-boundary-%s-result.json' % jax.default_backend())
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
