#!/usr/bin/env python
"""Contest the gather wall: Pallas pipelined-gather SpMM vs the XLA
ELL SpMM vs host scipy CSR, at the 100k and (optionally) 1M state
points (BASELINE config 5's regime).

The round-3 concession of the 3e5-1e6-state sparse decade to host
ARPACK rests on XLA's gather lowering (~3-5e7 row-gathers/s,
benchmarks/gather-wall-result.json), not on hardware limits. This
measures whether a Mosaic kernel that issues the gathers as
pipelined DMAs (ops/spmm_pallas.py) moves that wall. Either outcome
is recorded: a win reopens the decade, a loss makes the concession
airtight.

Writes benchmarks/pallas-spmm-result.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _stage(msg):
    print('# %s %s' % (time.strftime('%H:%M:%S'), msg),
          file=sys.stderr, flush=True)


def one_point(n_states, n_blocks, k, repeats=5):
    import jax.numpy as jnp

    from enspara_tpu.msm import builders
    from enspara_tpu.msm.synthetic_data import sparse_metastable_counts
    from enspara_tpu.ops.sparse import ell_from_sparse, ell_spmm
    from enspara_tpu.ops.spmm_pallas import ell_spmm_pallas

    import scipy.sparse

    _stage('building %dk-state dataset' % (n_states // 1000))
    C = sparse_metastable_counts(n_states, n_blocks=n_blocks, seed=11)
    _, T, _ = builders.transpose(C)
    T = scipy.sparse.csr_matrix(T).astype(np.float64)
    cols, vals = ell_from_sparse(T, dtype=np.float32)
    w = cols.shape[1]

    rng = np.random.default_rng(0)
    X = rng.normal(size=(n_states, k)).astype(np.float32)

    out = {'n_states': n_states, 'nnz': int(T.nnz), 'ell_width': w,
           'k': k}

    cols_d, vals_d, X_d = (jnp.asarray(a) for a in (cols, vals, X))

    # --- XLA gather lowering (the wall)
    _stage('XLA ell_spmm warm-up')
    Y = ell_spmm(cols_d, vals_d, X_d)
    np.asarray(Y)                        # warm + materialize
    t0 = time.perf_counter()
    for _ in range(repeats):
        Y = ell_spmm(cols_d, vals_d, X_d)
    np.asarray(Y)
    out['xla_ell_ms'] = round(
        (time.perf_counter() - t0) / repeats * 1e3, 2)

    # --- Pallas pipelined-gather kernel
    _stage('pallas compile + first run')
    t0 = time.perf_counter()
    Yp = ell_spmm_pallas(cols_d, vals_d, X_d)
    np.asarray(Yp)
    out['pallas_compile_plus_first_ms'] = round(
        (time.perf_counter() - t0) * 1e3, 1)
    _stage('pallas timed repeats')
    t0 = time.perf_counter()
    for _ in range(repeats):
        Yp = ell_spmm_pallas(cols_d, vals_d, X_d)
    Yp_h = np.asarray(Yp)
    out['pallas_ms'] = round(
        (time.perf_counter() - t0) / repeats * 1e3, 2)
    out['pallas_row_gathers_per_s'] = int(
        n_states * w / (out['pallas_ms'] / 1e3))

    # correctness against fp64 host truth
    Yref = T @ X.astype(np.float64)
    out['pallas_max_err'] = float(np.abs(Yp_h - Yref).max())
    assert out['pallas_max_err'] < 1e-2 * max(1.0, np.abs(Yref).max())

    # --- host scipy CSR fp64 (the reference's engine)
    _stage('host scipy')
    Xh = X.astype(np.float64)
    T @ Xh
    t0 = time.perf_counter()
    for _ in range(repeats):
        T @ Xh
    out['host_scipy_fp64_ms'] = round(
        (time.perf_counter() - t0) / repeats * 1e3, 2)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--million', action='store_true')
    args = ap.parse_args()

    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    points = [one_point(100_000, 25, 64)]
    if args.million:
        points.append(one_point(1_000_000, 50, 64, repeats=2))

    result = {
        'backend': jax.default_backend(),
        'device': str(jax.devices()[0]),
        'jax_version': jax.__version__,
        'timestamp_source': 'end-of-run wall clock, written by '
                            'benchmarks/pallas_spmm.py',
        'points': points,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'pallas-spmm-%s-result.json' % jax.default_backend())
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
