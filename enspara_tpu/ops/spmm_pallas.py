"""Pallas sliced-ELL SpMM: the direct contest of the XLA gather wall.

``Y = A @ X`` with A in ELL form ((n, w) cols/vals) and X (n, k)
dense. The XLA lowering of this op is a per-row dynamic-slice gather
that measures ~3-5e7 row-gathers/s on a v5e — DMA-latency-bound, ~60x
under HBM bandwidth (benchmarks/gather-wall-result.json). This kernel
is the Mosaic-native counterattack: the gather is expressed through
scalar-prefetched BlockSpec index maps, so the Pallas pipeline ISSUES
the row fetches as hardware DMAs with double buffering and block
revisiting, instead of XLA's serialized dynamic slices:

- grid (n/R, w): R=8 ELL rows per step (one sublane group), width
  positions innermost;
- fp32 tile granularity is (8, 128), so operand s of R fetches the
  (8, 128) X GROUP containing row ``cols[i*R+s, j]`` via its
  scalar-prefetched index map (block row = col // 8) and a sublane
  mask picks the row in-kernel — the pipeline overlaps the next
  step's R group-DMAs with this step's select+FMA;
- the (R, 128) output block is indexed by i only, so Mosaic keeps it
  resident in VMEM across the whole inner j sweep (w accumulations
  per flush); ELL values ride as full-width (R, w) blocks with the
  j-th column selected by an iota mask (w is tiny).

k > 128 runs as independent 128-wide passes at the wrapper level.

Fundamental limit this does NOT lift: every nonzero still moves one
512-byte X row across HBM at random. If the pipelined DMA rate still
loses to host scipy CSR, the gather-wall concession is airtight —
that measurement is the point (benchmarks/pallas_spmm.py either way).

Reference analog: scipy CSR matvec serving ARPACK
(enspara/msm/transition_matrices.py:214-221).
"""

import functools

import numpy as np

__all__ = ['ell_spmm_pallas']

_R = 8          # ELL rows per grid step (fp32 sublane group)
_LANE = 128     # lane width; k runs in chunks of this


def _bucket(x, q):
    return int(-(-x // q) * q)


@functools.lru_cache(maxsize=16)
def _spmm_fn(n, w, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cols_ref, vals_ref, *rest):
        x_refs, out_ref = rest[:-1], rest[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # select the j-th ELL column of the (R, w) value block
        lane = jax.lax.broadcasted_iota(jnp.int32, (_R, w), 1)
        v = jnp.sum(jnp.where(lane == j, vals_ref[:], 0.0), axis=1)

        # each fetched tile is the (8, 128) X group CONTAINING the
        # gathered row (fp32 tile granularity); pick the row out with
        # a sublane mask
        sub = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANE), 0)
        rows = []
        for s in range(_R):
            r = cols_ref[i * _R + s, j] % _R
            rows.append(jnp.sum(
                jnp.where(sub == r, x_refs[s][:], 0.0), axis=0))
        out_ref[:] = out_ref[:] + v[:, None] * jnp.stack(rows, 0)

    def x_spec(s):
        # operand s serves ELL row i*R+s: its (8, 128) block row
        # index is the scalar-prefetched column index / 8 — the
        # gather IS the index map
        return pl.BlockSpec(
            (_R, _LANE),
            lambda i, j, cols: (cols[i * _R + s, j] // _R, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _R, w),
        in_specs=[
            pl.BlockSpec((_R, w), lambda i, j, cols: (i, 0),
                         memory_space=pltpu.VMEM),      # vals
        ] + [x_spec(s) for s in range(_R)],
        out_specs=pl.BlockSpec((_R, _LANE), lambda i, j, cols: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(cols, vals, X):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, _LANE), X.dtype),
            interpret=interpret,
        )(cols, vals, *([X] * _R))

    return run


def ell_spmm_pallas(cols, vals, X):
    """``A @ X`` with A in ELL form, via the Pallas pipelined-gather
    kernel. Pads (n -> R rows, k -> lane chunks) internally; returns
    (n, k)."""
    import jax
    import jax.numpy as jnp

    n, w = cols.shape
    k = X.shape[1]
    n_pad = _bucket(n, _R)
    k_pad = _bucket(k, _LANE)

    if n_pad != n:
        pad_cols = np.repeat(
            np.arange(n, n_pad, dtype=np.int32)[:, None], w, axis=1)
        cols = jnp.concatenate([jnp.asarray(cols), pad_cols], axis=0)
        vals = jnp.concatenate(
            [jnp.asarray(vals),
             jnp.zeros((n_pad - n, w), vals.dtype)], axis=0)
        X = jnp.concatenate(
            [X, jnp.zeros((n_pad - n, k), X.dtype)], axis=0)
    if k_pad != k:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], k_pad - k), X.dtype)], axis=1)

    interpret = jax.default_backend() == 'cpu'   # CPU: interpret mode
    fn = _spmm_fn(n_pad, w, interpret)
    chunks = [fn(cols, vals, X[:, c:c + _LANE])
              for c in range(0, k_pad, _LANE)]
    Y = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 1)
    return Y[:n, :k]
