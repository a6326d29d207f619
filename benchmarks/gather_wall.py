#!/usr/bin/env python
"""The gather wall: why k=1 sparse absorbing solves stay on the host.

Measures the XLA:TPU row-gather rate that bounds every ELL-form SpMV
(``Y += vals[:, j, None] * X[cols[:, j]]`` — one dynamic row-gather
per nnz) as a function of problem size and block width, plus the
derived ceiling for a 1M-state committor CG. Companion ablation to
docs/performance.md "negative result (1M-state k=1 absorbing
solves)".

Key facts this records (measured on one v5e):
- gather throughput is per-ROW-instruction bound (~1e8 rows/s), so
  wide blocks (k >= 32) amortize it and the filtered eigensolver wins
  on device, while k=1 matvecs pay full price per nnz;
- source-window locality does NOT help (tested 1M/100k/8k windows) —
  chunked-source ELL designs buy nothing;
- at ~1e8 rows/s, a 14M-nnz 1M-state CG iteration costs >= 140 ms on
  the device vs ~47 ms for scipy's fp64 CSR SpMV on one host core,
  and the ~1200-iteration committor solve therefore belongs on the
  host (reference engine: enspara/tpt/core.py:96 spsolve; ours:
  pi-symmetrized Jacobi-CG, tpt/core.py).

Writes benchmarks/gather-wall-result.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import scipy.sparse

    from enspara_tpu.msm import builders
    from enspara_tpu.msm.synthetic_data import sparse_metastable_counts
    from enspara_tpu.ops.sparse import ell_from_sparse

    result = {
        'backend': jax.default_backend(),
        'device': str(jax.devices()[0]),
        'n_devices': len(jax.devices()),
        'jax_version': jax.__version__,
        'timestamp_source': 'end-of-run wall clock, written by '
                            'benchmarks/gather_wall.py',
        'points': [],
    }

    def chain(cols, vals, X, iters):
        def body(_, X):
            def col(j, Y):
                c = lax.dynamic_index_in_dim(cols, j, 1, keepdims=False)
                v = lax.dynamic_index_in_dim(vals, j, 1, keepdims=False)
                return Y + v[:, None] * jnp.take(X, c, axis=0)
            Y = lax.fori_loop(0, cols.shape[1], col, jnp.zeros_like(X))
            return Y / jnp.linalg.norm(Y)
        return lax.fori_loop(0, iters, body, X)

    chain_j = jax.jit(chain, static_argnames='iters')
    rng = np.random.default_rng(0)

    for n, n_blocks in ((100_000, 50), (1_000_000, 200)):
        C = sparse_metastable_counts(n, n_blocks=n_blocks, seed=11)
        _, T, pi = builders.transpose(C)
        sq = np.sqrt(np.asarray(pi))
        S = scipy.sparse.diags(sq) @ scipy.sparse.csr_matrix(T) @ \
            scipy.sparse.diags(1.0 / sq)
        S = ((S + S.T) * 0.5).tocsr()
        cols, vals = ell_from_sparse(S, np.float32)
        w = cols.shape[1]
        cols_d, vals_d = jnp.asarray(cols), jnp.asarray(vals)

        # host fp64 CSR SpMV baseline (scipy, 1 core)
        S64 = S.astype(np.float64)
        xh = rng.normal(size=(n,))
        S64 @ xh
        t0 = time.perf_counter()
        for _ in range(5):
            xh2 = S64 @ xh
        t_host = (time.perf_counter() - t0) / 5

        for k in (1, 8, 64):
            X0 = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
            reps = 30 if n <= 100_000 else 10
            r = chain_j(cols_d, vals_d, X0, 3)
            np.asarray(r)               # materialize (axon caveat)
            t0 = time.perf_counter()
            r = chain_j(cols_d, vals_d, X0, reps)
            np.asarray(r)
            dt = (time.perf_counter() - t0) / reps
            result['points'].append({
                'n_states': n, 'nnz': int(S.nnz), 'ell_width': w,
                'k': k,
                'device_ms_per_matvec': round(dt * 1e3, 2),
                'device_row_gathers_per_s': round(w * n / dt),
                'host_scipy_fp64_ms_per_matvec': round(t_host * 1e3,
                                                       2),
            })
            print(result['points'][-1], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'gather-wall-result.json')
    with open(out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
