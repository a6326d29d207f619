"""Multi-iteration fused k-centers chunk kernel.

The per-iteration kernel (ops/qcp_update_pallas) already fuses RMSD +
min-update into one pass over the frames, but at n=1M it still pays
~0.6 ms of fixed cost per center on top of the ~1.1 ms HBM floor:
a pallas launch, a separate argmax pass over the distance row, and the
center-column gather all sit between launches.

This kernel folds ``G`` whole k-centers iterations into ONE pallas
call with grid ``(G, n_tiles)`` (TPU grids run sequentially, so the
loop-carried dependence between iterations is legal):

* the running ``(distances, assignments)`` state lives in VMEM
  scratch for the WHOLE launch: loaded from the input blocks during
  the first iteration, updated in place, written through to the
  output blocks every step (so the final flush is the final state).
  State never re-crosses HBM between iterations — the only HBM
  traffic per iteration is the frame stream itself.
* the global argmax of the updated distances is accumulated as a
  PER-LANE ``(1, tile)`` running (max, global index) pair in VMEM —
  tiles contribute one elementwise compare/select, and the cross-lane
  scalar reduction runs once per iteration boundary instead of once
  per tile (scalar reductions on the VPU cost microseconds; per-tile
  they were the whole fixed cost back again). Tie-breaking matches
  ``np.argmax``: strict ``>`` per lane keeps the earliest tile, and
  the boundary takes the smallest global index among maximal lanes,
  which is exactly the first global maximum.
* at each iteration boundary the winning frame's column is gathered
  from an HBM alias of the frame array: HBM slices must be 128-lane
  aligned, so the aligned ``(rows, 128)`` window holding the column is
  DMA'd into VMEM (~100 KB — hidden behind the frame stream) and the
  column one-hot-selected; its G value is recomputed as
  ``sum(col**2)`` instead of a second gather.
* early stop (``dist_cutoff`` / ``n_clusters``) raises a ``stopped``
  flag in SMEM: remaining iterations in the chunk skip compute and
  pass their tiles through (their block fetches still stream, which is
  why the caller chunks rather than launching one ``k_max`` grid).

Reference semantics: enspara/cluster/kcenters.py:217-231 (the
sequential Gonzalez loop; each new center is the argmax of the running
min-distance), with the same first-max tie-breaking as ``np.argmax``.

``frames_r`` may be float32 or bfloat16: the loop is HBM-bound, so the
bf16 stream (half the bytes) runs ~2x; blocks are upconverted once
in-register and ALL arithmetic (S, G, Newton, state) stays fp32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import qcp

__all__ = ['kcenters_chunk_pallas']

_IMAX = jnp.iinfo(jnp.int32).max


def _kernel(gidx0_ref, max0_ref, ioff_ref, ntot_ref, cutoff_ref,
            frames_hbm, f_ref, g_ref, dist_ref, assig_ref,
            dist_out, assig_out, ctr_out, ngidx_out, nmax_out,
            dist_s, assig_s, win_ref, col_ref, vmax_ref, varg_ref,
            smem_f, smem_i, sem,
            *, a_pad, n_atoms_real, tile, approx_recip):
    ik = pl.program_id(0)
    it = pl.program_id(1)
    n_k = pl.num_programs(0)
    n_t = pl.num_programs(1)
    sl = pl.ds(pl.multiple_of(it * tile, tile), tile)

    # ---- first iteration: stage the incoming state into VMEM
    @pl.when(ik == 0)
    def _():
        dist_s[:, sl] = dist_ref[:]
        assig_s[:, sl] = assig_ref[:]

    # ---- iteration boundary: reduce the per-lane argmax carry to the
    # next center, fetch its column, reset the accumulator
    @pl.when(it == 0)
    def _():
        @pl.when(ik == 0)
        def _():
            smem_f[0] = max0_ref[0, 0]       # acc max
            smem_i[0] = gidx0_ref[0, 0]      # acc argmax (global frame)
            smem_i[1] = 0                    # stopped flag

        @pl.when((ik > 0) & (smem_i[1] == 0))
        def _():
            m = jnp.max(vmax_ref[:])
            smem_f[0] = m
            smem_i[0] = jnp.min(jnp.where(vmax_ref[:] == m,
                                          varg_ref[:], _IMAX))

        cur_max = smem_f[0]
        cur_gidx = smem_i[0]
        stop = ((cur_max <= cutoff_ref[0, 0])
                | (ioff_ref[0, 0] + ik >= ntot_ref[0, 0])
                | (smem_i[1] == 1))
        smem_i[1] = jnp.where(stop, 1, 0)
        ctr_out[ik, 0] = jnp.where(stop, -1, cur_gidx)

        @pl.when(jnp.logical_not(stop))
        def _():
            # HBM slices must be 128-lane aligned: fetch the aligned
            # window holding the column, then one-hot-select the lane
            off = cur_gidx % 128
            base = pl.multiple_of(cur_gidx - off, 128)
            dma = pltpu.make_async_copy(
                frames_hbm.at[:, pl.ds(base, 128)], win_ref, sem)
            dma.start()
            dma.wait()
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) == off).astype(jnp.float32)
            col_ref[:] = jnp.sum(
                win_ref[:].astype(jnp.float32) * onehot, axis=1,
                keepdims=True)
            smem_f[1] = jnp.sum(col_ref[:] * col_ref[:])   # center G
            vmax_ref[:] = jnp.full((1, tile), -jnp.inf, jnp.float32)
            varg_ref[:] = jnp.zeros((1, tile), jnp.int32)

    @pl.when(smem_i[1] == 0)
    def _():
        fb = f_ref[:]                                      # (3A, TILE)
        if fb.dtype != jnp.float32:
            # bf16 streaming mode: frames cross HBM at half width and
            # are upconverted once per block in-register; S/G/distance
            # arithmetic stays fp32
            fb = fb.astype(jnp.float32)
        # S[i][j] = sum_a f[i*A+a, t] * c[a, j]; the column is stored
        # rows-first (j*A_pad + a), so c[:, j] is a static row slice.
        # Accumulate over explicit 8-sublane chunks so the lowering is
        # pure vreg FMAs with ONE short cross-sublane reduce per
        # component — `sum(fi * cj)` materializes the full (A_pad,
        # TILE) product before reducing, nearly doubling the VPU ops
        # of the hottest loop in the framework.
        S = [[None] * 3 for _ in range(3)]
        for j in range(3):
            for i in range(3):
                fo, co = i * a_pad, j * a_pad
                acc = fb[fo:fo + 8, :] * col_ref[co:co + 8, :]
                for c in range(8, a_pad, 8):
                    acc = acc + (fb[fo + c:fo + c + 8, :]
                                 * col_ref[co + c:co + c + 8, :])
                S[i][j] = jnp.sum(acc, axis=0, keepdims=True)

        gsum = g_ref[:] + smem_f[1]
        Sc = tuple(S[i][j] for i in range(3) for j in range(3))
        d_new = qcp.rmsd_from_S_components_unrolled(
            Sc, gsum, n_atoms_real,
            approx_recip=approx_recip)                     # (1, TILE)

        old_d = dist_s[:, sl]
        upd = d_new < old_d
        nd = jnp.where(upd, d_new, old_d)
        cid = ioff_ref[0, 0] + ik
        dist_s[:, sl] = nd
        assig_s[:, sl] = jnp.where(upd, cid, assig_s[:, sl])

        # per-lane running argmax: one elementwise compare/select per
        # tile (strict > keeps the earliest tile per lane)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        better = nd > vmax_ref[:]
        vmax_ref[:] = jnp.where(better, nd, vmax_ref[:])
        varg_ref[:] = jnp.where(better, it * tile + lanes,
                                varg_ref[:])

    # write-through: the last visit of each block flushes final state
    dist_out[:] = dist_s[:, sl]
    assig_out[:] = assig_s[:, sl]

    @pl.when((ik == n_k - 1) & (it == n_t - 1))
    def _():
        # when stopped, the failing (max, gidx) pair sits in SMEM; the
        # lane carry may even be uninitialized (stop at ik == 0)
        @pl.when(smem_i[1] == 0)
        def _():
            m = jnp.max(vmax_ref[:])
            smem_f[0] = m
            smem_i[0] = jnp.min(jnp.where(vmax_ref[:] == m,
                                          varg_ref[:], _IMAX))
        ngidx_out[0, 0] = smem_i[0]
        nmax_out[0, 0] = smem_f[0]


@functools.partial(jax.jit,
                   static_argnames=('n_iters', 'n_atoms_real',
                                    'interpret', 'tile'))
def kcenters_chunk_pallas(frames_r, g, dist, assig, gidx0, max0,
                          i_offset, n_total, dist_cutoff, n_iters,
                          n_atoms_real, interpret=False, tile=2048):
    """Run ``n_iters`` fused k-centers iterations in one pallas call.

    Parameters
    ----------
    frames_r : (3*A_pad, n) centered coordinates, rows ``i*A_pad + a``
        (n divisible by ``tile``; padding entries zero). The (1, n)
        state arrays must fit in VMEM alongside the frame stream —
        the caller gates on that.
    g : (1, n) per-frame G values.
    dist, assig : (1, n) running state (dist of padded frames = -inf).
    gidx0, max0 : (1, 1) int32 / float32 — argmax/max of ``dist``
        (the first center of the chunk), carried from the previous
        chunk's ``(next_gidx, next_max)``.
    i_offset : (1, 1) int32 — global ordinal of this chunk's first
        center (warm starts included).
    n_total : (1, 1) int32 — total center budget; iterations at or
        beyond it are skipped.
    dist_cutoff : (1, 1) float32 — stop once the max distance is <= it.

    Returns ``(dist, assig, ctr_inds (n_iters, 1) with -1 for skipped
    slots, next_gidx (1, 1), next_max (1, 1))``.
    """
    rows, n = frames_r.shape
    a_pad = rows // 3
    n_tiles = n // tile
    kernel = functools.partial(_kernel, a_pad=a_pad,
                               n_atoms_real=float(n_atoms_real),
                               tile=tile,
                               approx_recip=True)

    smem11 = pl.BlockSpec((1, 1), lambda ik, it: (0, 0),
                          memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_iters, n_tiles),
        in_specs=[
            smem11,                                         # gidx0
            smem11,                                         # max0
            smem11,                                         # i_offset
            smem11,                                         # n_total
            smem11,                                         # cutoff
            pl.BlockSpec(memory_space=pl.ANY),              # frames HBM
            pl.BlockSpec((rows, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),          # frames
            pl.BlockSpec((1, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),          # g
            pl.BlockSpec((1, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),          # dist
            pl.BlockSpec((1, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),          # assig
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda ik, it: (0, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_iters, 1), lambda ik, it: (0, 0),
                         memory_space=pltpu.SMEM),          # ctr inds
            smem11,                                         # next gidx
            smem11,                                         # next max
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((n_iters, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),                # dist state
            pltpu.VMEM((1, n), jnp.int32),                  # assig state
            pltpu.VMEM((rows, 128), frames_r.dtype),        # DMA window
            pltpu.VMEM((rows, 1), jnp.float32),             # center col
            pltpu.VMEM((1, tile), jnp.float32),             # lane max
            pltpu.VMEM((1, tile), jnp.int32),               # lane arg
            pltpu.SMEM((2,), jnp.float32),                  # acc max, G
            pltpu.SMEM((2,), jnp.int32),                    # acc arg, stop
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={8: 0, 9: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(gidx0, max0, i_offset, n_total, dist_cutoff,
      frames_r, frames_r, g, dist, assig)
