"""Pallas sliced-ELL SpMM: the direct contest of the XLA gather wall.

``Y = A @ X`` with A in ELL form ((n, w) cols/vals) and X (n, k)
dense. The XLA lowering of this op is a per-row dynamic-slice gather
that measures ~3-5e7 row-gathers/s on a v5e — DMA-latency-bound, ~60x
under HBM bandwidth (benchmarks/gather-wall-result.json). This kernel
is the Mosaic-native counterattack, built like a paged-attention
lookup:

- X stays WHOLE in HBM (`memory_space=ANY`); the kernel issues its
  own async copies for the gathered rows instead of letting XLA
  serialize dynamic slices;
- grid (n/8,): each step owns 8 ELL rows and sweeps their width
  inside a ``fori_loop``, carrying the (8, 128) accumulator in
  registers;
- per width position, 8 row-group DMAs (fp32 tile granularity is
  (8, 128), so the copy lands the group containing the row and a
  sublane mask picks the row out) are DOUBLE-BUFFERED across loop
  iterations: bank b serves iteration j while bank 1-b is already
  filling for j+1 — the memory latency the XLA gather eats serially
  is overlapped with compute and with itself;
- the ELL column indices AND values ride in SMEM blocks (8, w) so
  both are O(1) scalar reads per entry.

k > 128 runs as independent 128-wide passes at the wrapper level.

Fundamental limit this does NOT lift: every nonzero still moves a
4 KB X group across HBM at random. If the in-kernel DMA pipeline
still loses to host scipy CSR, the gather-wall concession is
airtight — that measurement is the point
(benchmarks/pallas_spmm.py either way).

Reference analog: scipy CSR matvec serving ARPACK
(enspara/msm/transition_matrices.py:214-221).
"""

import functools

import numpy as np

__all__ = ['ell_spmm_pallas']

_R = 8          # ELL rows per grid step (fp32 sublane group)
_LANE = 128     # lane width; k runs in chunks of this


from .sparse import round_up as _bucket


@functools.lru_cache(maxsize=16)
def _spmm_fn(n, w, banks=2, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cols_ref, vals_ref, x_any, out_ref, scratch, sems):
        sub = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANE), 0)

        def dma(bank, s, j):
            grp = cols_ref[s, j] // _R
            return pltpu.make_async_copy(
                x_any.at[pl.ds(grp * _R, _R), :],
                scratch.at[bank, s],
                sems.at[bank, s])

        def issue(bank, j):
            for s in range(_R):
                dma(bank, s, j).start()

        # prime banks-1 width positions ahead
        for j0 in range(min(banks - 1, w)):
            issue(j0, j0)

        def body(j, acc):
            bank = jax.lax.rem(j, banks)

            @pl.when(j + banks - 1 < w)
            def _():
                # keep banks-1 positions in flight ahead of consume
                issue(jax.lax.rem(j + banks - 1, banks),
                      j + banks - 1)

            rows = []
            for s in range(_R):
                dma(bank, s, j).wait()
                r = cols_ref[s, j] % _R
                # the value is a scalar SMEM read (O(1)) — an earlier
                # VMEM iota-mask select cost O(w) per entry and would
                # distort the gather measurement for wide rows
                v_s = vals_ref[s, j]
                rows.append(v_s * jnp.sum(
                    jnp.where(sub == r, scratch[bank, s], 0.0),
                    axis=0))
            return acc + jnp.stack(rows, axis=0)

        out_ref[:] = jax.lax.fori_loop(
            0, w, body, jnp.zeros((_R, _LANE), jnp.float32))

    @jax.jit
    def run(cols, vals, X):
        return pl.pallas_call(
            kernel,
            grid=(n // _R,),
            in_specs=[
                pl.BlockSpec((_R, w), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),   # cols
                pl.BlockSpec((_R, w), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),   # vals
                pl.BlockSpec(memory_space=pl.ANY),       # X in HBM
            ],
            out_specs=pl.BlockSpec((_R, _LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, _LANE), X.dtype),
            scratch_shapes=[
                pltpu.VMEM((banks, _R, _R, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((banks, _R)),
            ],
            interpret=interpret,
        )(cols, vals, X)

    return run


def ell_spmm_pallas(cols, vals, X):
    """``A @ X`` with A in ELL form, via the Pallas in-kernel-DMA
    gather kernel. Pads (n -> tile groups, k -> lane chunks)
    internally; returns (n, k)."""
    import jax
    import jax.numpy as jnp

    # the kernel's scratch accumulator is float32: cast the operands
    # up front so non-fp32 inputs get a well-defined fp32 result
    # instead of a DMA/store dtype mismatch deep in Mosaic (ADVICE r4)
    X = jnp.asarray(X, jnp.float32)
    vals = jnp.asarray(vals, jnp.float32)

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

    import os
    # Mosaic lowering exists only for TPU; everything else (cpu, gpu)
    # runs the interpreter so the kernel is usable-or-slow, never a
    # cryptic lowering error
    interpret = jax.default_backend() != 'tpu'
    banks = int(os.environ.get('ENSPARA_TPU_SPMM_BANKS', '2'))
    fn = _spmm_fn(n_pad, w, banks, interpret)
    chunks = [fn(cols, vals, X[:, c:c + _LANE])
              for c in range(0, k_pad, _LANE)]
    Y = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 1)
    return Y[:n, :k]
