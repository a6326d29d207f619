"""Sparse-to-device materialization helpers.

TPU linear algebra (LU, eigh) wants dense operands in HBM, but
shipping a host-densified matrix through PCIe (or worse, a dev
tunnel) moves n^2 mostly-zero bytes. Scattering the COO triplets on
device moves O(nnz) instead — a 10k-state MSM uploads <1 MB rather
than 400 MB.
"""

import functools

import numpy as np

__all__ = ['dense_on_device']


@functools.lru_cache(maxsize=32)
def _scatter_fn(n, m):
    """Shape-keyed cached jitted scatter: a fresh ``@jax.jit`` closure
    per call would re-trace (and round-trip the compile cache) on
    EVERY materialization — repeated solves over the same MSM (the
    committors → mfpts → fluxes pattern) must reuse one executable.
    Bounded at 32 shapes so a long-lived process materializing many
    differently-sized matrices can't pin XLA executables without
    limit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scatter(rows, cols, v):
        return jnp.zeros((n, m), jnp.float32).at[rows, cols].set(v)

    return scatter


def dense_on_device(sp, scale_rows=None, scale_cols=None):
    """Materialize ``sp`` (scipy sparse) dense fp32 in HBM from its
    COO triplets. Optional per-row / per-column scaling vectors are
    applied to the values on host (O(nnz)) before the scatter — this
    computes D_r @ sp @ D_c without ever forming a dense host array.
    """
    import jax.numpy as jnp

    coo = sp.tocoo()
    coo.sum_duplicates()                # .set() needs unique indices
    n, m = coo.shape

    vals = coo.data.astype(np.float64)
    if scale_rows is not None:
        vals = vals * np.asarray(scale_rows, np.float64)[coo.row]
    if scale_cols is not None:
        vals = vals * np.asarray(scale_cols, np.float64)[coo.col]

    scatter = _scatter_fn(n, m)
    return scatter(jnp.asarray(coo.row), jnp.asarray(coo.col),
                   jnp.asarray(vals.astype(np.float32)))
