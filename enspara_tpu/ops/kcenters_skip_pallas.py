"""Multi-iteration k-centers chunk kernel with tile-granular
triangle-inequality skipping.

The reference prunes per frame (enspara/cluster/kcenters.py:287-296,
Zhao et al. 2013): when center ``c_new`` is added, a frame ``f``
assigned to ``c_a`` cannot move if ``d(c_a, c_new) >= 2 d(f, c_a)``.
Per-LANE pruning saves nothing on lockstep SIMD — but the chunk loop
is HBM-stream-bound, so pruning at TILE granularity can skip the
frame-block DMA itself, which is the only remaining way below the
stream floor the non-skip chunk kernel sits at (VERDICT r4 item 1).

The skip bound needs no center-center matrix. In Gonzalez k-centers
the new center is the argmax of the running min-distances, so
``dist[c_new] = min_j d(c_j, c_new) = md`` (the current global max).
Hence EVERY existing center satisfies ``d(c_j, c_new) >= md``, and a
frame is provably unchanged whenever ``dist[f] <= md/2`` — a whole
tile whenever ``tile_max <= md/2``. At the boundary case
``dist[f] == md/2`` the update is still a no-op because the kernel's
min-update is strict ``<``, so skipping is exactly equivalent (up to
fp rounding of the QCP distances near the threshold — the same
caveat the reference's per-frame rule carries).

Differences from the non-skip chunk kernel
(``ops/kcenters_chunk_pallas``):

* frames are fetched with MANUAL double-buffered DMA (skippable);
  the per-lane argmax carry is replaced by per-tile MAX summaries,
  updated with one cross-lane reduce per COMPUTED tile and carried
  across chunk calls (a skipped tile's stored summary stays exact
  because its distances did not change). The summaries live TWICE: a
  (1, t_pad) VMEM vector for the boundary reduce, and an SMEM scalar
  array for the per-step skip queries — Mosaic cannot read a dynamic
  unaligned lane from VMEM, but SMEM indexes freely. No per-tile
  ARGMAX is maintained: the boundary finds the winning tile from the
  max vector and recomputes the argmax inside that one tile (its
  (1, tile) distance slice is tile-aligned, so the dynamic VMEM read
  is legal) — one extra reduce per ITERATION instead of one per tile.
* the (dist, assig, g) state is staged ONCE per chunk call by DMA
  into whole-array VMEM buffers instead of streaming (1, tile)
  blocks every step — the non-skip kernel pays ~20 MB/iteration of
  BlockSpec traffic for them at n=1M (~2.6% of the frame stream).
* ``skipcnt`` output: skipped-tile count per iteration (-1 for
  iterations past the stop), the instrumentation for the skip-
  fraction ablation.

Tie-breaking matches ``np.argmax`` exactly: within a tile the first
maximal lane wins (min global index among maximal), and across tiles
the smallest global index among maximal tiles wins.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import qcp

__all__ = ['kcenters_chunk_skip_pallas', 'tile_summaries',
           'skip_t_pad']

_IMAX = jnp.iinfo(jnp.int32).max


def _kernel(gidx0_ref, max0_ref, ioff_ref, ntot_ref, cutoff_ref,
            tmax_sin, frames_hbm, g_hbm, dist_hbm, assig_hbm,
            tmax_in,
            dist_out, assig_out, ctr_out, ngidx_out, nmax_out,
            tmax_out, skipcnt_out,
            g_s, fbuf, win_ref, col_ref, stmax,
            smem_f, smem_i, sem, sem_c, sem_s,
            *, a_pad, n_atoms_real, tile, t_pad, approx_recip):
    ik = pl.program_id(0)
    it = pl.program_id(1)
    n_k = pl.num_programs(0)
    n_t = pl.num_programs(1)
    sl = pl.ds(pl.multiple_of(it * tile, tile), tile)
    lanes_t = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)

    def global_argmax():
        """(max, first global argmax) of the live distances: winning
        tile from the max vector (ties -> smallest tile index, which
        holds the first global occurrence), then one reduce inside
        that tile's — tile-aligned, so dynamically sliceable — row."""
        m = jnp.max(tmax_out[:])
        win_t = jnp.min(jnp.where(tmax_out[:] == m, lanes_t, _IMAX))
        row = dist_out[:, pl.ds(pl.multiple_of(win_t * tile, tile),
                                tile)]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        return m, win_t * tile + jnp.min(
            jnp.where(row == m, lanes, _IMAX))

    # ---- launch start: stage state into the VMEM-resident buffers
    # (dist/assig live in their whole-array OUT buffers for the whole
    # launch; one flush at the end is the only write-back traffic)
    @pl.when((ik == 0) & (it == 0))
    def _():
        tmax_out[:] = tmax_in[:]

        def body(j, _):
            stmax[j] = tmax_sin[0, j]
            return 0
        jax.lax.fori_loop(0, n_t, body, 0)
        for k, (src, dst) in enumerate(((dist_hbm, dist_out),
                                        (assig_hbm, assig_out),
                                        (g_hbm, g_s))):
            dma = pltpu.make_async_copy(src, dst, sem_s.at[k])
            dma.start()
            dma.wait()

    # ---- iteration boundary: next center from the tile summaries,
    # center-column fetch, and skip-count instrumentation
    @pl.when(it == 0)
    def _():
        @pl.when(ik == 0)
        def _():
            smem_f[0] = max0_ref[0, 0]       # incoming max
            smem_i[0] = gidx0_ref[0, 0]      # incoming argmax
            smem_i[1] = 0                    # stopped flag

        @pl.when((ik > 0) & (smem_i[1] == 0))
        def _():
            m, gidx = global_argmax()
            smem_f[0] = m
            smem_i[0] = gidx

        cur_max = smem_f[0]
        cur_gidx = smem_i[0]
        stop = ((cur_max <= cutoff_ref[0, 0])
                | (ioff_ref[0, 0] + ik >= ntot_ref[0, 0])
                | (smem_i[1] == 1))
        smem_i[1] = jnp.where(stop, 1, 0)
        ctr_out[ik, 0] = jnp.where(stop, -1, cur_gidx)

        @pl.when(stop)
        def _():
            skipcnt_out[ik, 0] = -1

        @pl.when(jnp.logical_not(stop))
        def _():
            # HBM slices must be 128-lane aligned: fetch the aligned
            # window holding the center column, one-hot-select it
            off = cur_gidx % 128
            base = pl.multiple_of(cur_gidx - off, 128)
            dma = pltpu.make_async_copy(
                frames_hbm.at[:, pl.ds(base, 128)], win_ref, sem_c)
            dma.start()
            dma.wait()
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) == off).astype(jnp.float32)
            col_ref[:] = jnp.sum(
                win_ref[:].astype(jnp.float32) * onehot, axis=1,
                keepdims=True)
            smem_f[1] = jnp.sum(col_ref[:] * col_ref[:])   # center G

            # instrumentation only — the actual per-step decisions
            # use the IDENTICAL scalar compare on the SMEM copy
            skippable = ((tmax_out[:] <= 0.5 * cur_max)
                         & jnp.isfinite(cur_max)
                         & (lanes_t < n_t))
            skipcnt_out[ik, 0] = jnp.sum(skippable.astype(jnp.int32))

    # ---- per-step skip decisions: scalar compares on the SMEM tile
    # maxes. A tile's SMEM entry only changes when that tile computes,
    # so the prefetch decision at step it-1 and the wait decision at
    # step it agree by construction. Gonzalez bound guarded on finite
    # md (a fresh run's +inf distances carry no bound).
    cur_max = smem_f[0]
    finite = cur_max < jnp.inf
    not_stopped = smem_i[1] == 0

    def tile_skippable(j):
        return (stmax[j] <= 0.5 * cur_max) & finite

    compute_cur = not_stopped & jnp.logical_not(tile_skippable(it))
    b = jax.lax.rem(it, 2)

    @pl.when(compute_cur & (it == 0))
    def _():
        # cold start: tile 0 has no predecessor step to prefetch it
        pltpu.make_async_copy(
            frames_hbm.at[:, sl], fbuf.at[b], sem.at[b]).start()

    # prefetch the next tile (same iteration only) before waiting on
    # the current one, so the DMA queue stays ahead of compute
    nxt = it + 1
    nxt_skip = tile_skippable(jnp.minimum(nxt, n_t - 1))

    @pl.when((nxt < n_t) & jnp.logical_not(nxt_skip) & not_stopped)
    def _():
        bn = jax.lax.rem(nxt, 2)
        pltpu.make_async_copy(
            frames_hbm.at[:, pl.ds(pl.multiple_of(nxt * tile, tile),
                                   tile)],
            fbuf.at[bn], sem.at[bn]).start()

    @pl.when(compute_cur)
    def _():
        pltpu.make_async_copy(
            frames_hbm.at[:, sl], fbuf.at[b], sem.at[b]).wait()
        fb = fbuf[b]                                   # (3A, TILE)
        if fb.dtype != jnp.float32:
            # bf16 streaming mode: half-width HBM stream, upconverted
            # once per block in-register; arithmetic stays fp32
            fb = fb.astype(jnp.float32)
        # S[i][j] = sum_a f[i*A+a, t] * c[a, j]; explicit 8-sublane
        # accumulation keeps the lowering pure vreg FMAs with ONE
        # short cross-sublane reduce per component (see the non-skip
        # chunk kernel for the ablation)
        S = [[None] * 3 for _ in range(3)]
        for j in range(3):
            for i in range(3):
                fo, co = i * a_pad, j * a_pad
                acc = fb[fo:fo + 8, :] * col_ref[co:co + 8, :]
                for c in range(8, a_pad, 8):
                    acc = acc + (fb[fo + c:fo + c + 8, :]
                                 * col_ref[co + c:co + c + 8, :])
                S[i][j] = jnp.sum(acc, axis=0, keepdims=True)

        gsum = g_s[:, sl] + smem_f[1]
        Sc = tuple(S[i][j] for i in range(3) for j in range(3))
        d_new = qcp.rmsd_from_S_components_unrolled(
            Sc, gsum, n_atoms_real,
            approx_recip=approx_recip)                 # (1, TILE)

        old_d = dist_out[:, sl]
        upd = d_new < old_d
        nd = jnp.where(upd, d_new, old_d)
        cid = ioff_ref[0, 0] + ik
        dist_out[:, sl] = nd
        assig_out[:, sl] = jnp.where(upd, cid, assig_out[:, sl])

        # refresh this tile's max summary (argmax is recomputed only
        # for the winning tile at the boundary — per-tile we pay ONE
        # cross-lane reduce, not two)
        m = jnp.max(nd)
        tmax_out[:] = jnp.where(lanes_t == it, m, tmax_out[:])
        stmax[it] = m

    @pl.when((ik == n_k - 1) & (it == n_t - 1))
    def _():
        # hand the NEXT chunk its (gidx0, max0); when stopped, the
        # failing pair still sits in SMEM
        @pl.when(smem_i[1] == 0)
        def _():
            m, gidx = global_argmax()
            smem_f[0] = m
            smem_i[0] = gidx
        ngidx_out[0, 0] = smem_i[0]
        nmax_out[0, 0] = smem_f[0]


def tile_summaries(dist, tile, t_pad):
    """Initial per-tile max summaries of a (1, n) distance row, in the
    kernel's carry layout. Padding lanes are -inf so they never win
    the boundary reduce."""
    n_pad = dist.shape[1]
    n_t = n_pad // tile
    m = jnp.max(dist.reshape(n_t, tile), axis=1)
    tmax = jnp.full((1, t_pad), -jnp.inf, jnp.float32)
    return tmax.at[0, :n_t].set(m.astype(jnp.float32))


def skip_t_pad(n_tiles):
    """Static summary-vector length: the 128-lane multiple covering
    ``n_tiles``."""
    return max(128, ((n_tiles + 127) // 128) * 128)


@functools.partial(jax.jit,
                   static_argnames=('n_iters', 'n_atoms_real',
                                    'interpret', 'tile'))
def kcenters_chunk_skip_pallas(frames_r, g, dist, assig, tmax,
                               gidx0, max0, i_offset, n_total,
                               dist_cutoff, n_iters, n_atoms_real,
                               interpret=False, tile=2048):
    """Run ``n_iters`` k-centers iterations in one pallas call with
    tile-granular triangle-inequality DMA skipping.

    Same contract as :func:`ops.kcenters_chunk_pallas
    .kcenters_chunk_pallas` plus the carried per-tile summary:

    Parameters
    ----------
    tmax : (1, t_pad) float32 — per-tile max of ``dist``, from
        :func:`tile_summaries` on the first call and the previous
        call's output afterwards. ``t_pad`` must equal
        ``skip_t_pad(n // tile)``.

    Returns ``(dist, assig, ctr_inds (n_iters, 1), next_gidx (1, 1),
    next_max (1, 1), tmax, skipcnt (n_iters, 1))`` where
    ``skipcnt[i]`` is the number of frame tiles whose DMA+compute was
    skipped in iteration ``i`` (-1 for iterations past the stop).
    """
    rows, n = frames_r.shape
    a_pad = rows // 3
    n_tiles = n // tile
    t_pad = skip_t_pad(n_tiles)
    assert tmax.shape == (1, t_pad), (tmax.shape, t_pad)
    kernel = functools.partial(_kernel, a_pad=a_pad,
                               n_atoms_real=float(n_atoms_real),
                               tile=tile, t_pad=t_pad,
                               approx_recip=True)

    smem11 = pl.BlockSpec((1, 1), lambda ik, it: (0, 0),
                          memory_space=pltpu.SMEM)
    whole = lambda shape: pl.BlockSpec(shape, lambda ik, it: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_iters, n_tiles),
        in_specs=[
            smem11,                                     # gidx0
            smem11,                                     # max0
            smem11,                                     # i_offset
            smem11,                                     # n_total
            smem11,                                     # cutoff
            pl.BlockSpec((1, t_pad), lambda ik, it: (0, 0),
                         memory_space=pltpu.SMEM),      # tmax (SMEM)
            pl.BlockSpec(memory_space=pl.ANY),          # frames HBM
            pl.BlockSpec(memory_space=pl.ANY),          # g HBM
            pl.BlockSpec(memory_space=pl.ANY),          # dist HBM
            pl.BlockSpec(memory_space=pl.ANY),          # assig HBM
            whole((1, t_pad)),                          # tmax in
        ],
        out_specs=[
            whole((1, n)),                              # dist state
            whole((1, n)),                              # assig state
            pl.BlockSpec((n_iters, 1), lambda ik, it: (0, 0),
                         memory_space=pltpu.SMEM),      # ctr inds
            smem11,                                     # next gidx
            smem11,                                     # next max
            whole((1, t_pad)),                          # tmax out
            pl.BlockSpec((n_iters, 1), lambda ik, it: (0, 0),
                         memory_space=pltpu.SMEM),      # skip counts
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((n_iters, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_iters, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # g state
            pltpu.VMEM((2, rows, tile), frames_r.dtype),  # frame bufs
            pltpu.VMEM((rows, 128), frames_r.dtype),    # center window
            pltpu.VMEM((rows, 1), jnp.float32),         # center col
            pltpu.SMEM((t_pad,), jnp.float32),          # tile maxes
            pltpu.SMEM((2,), jnp.float32),              # cur max, G
            pltpu.SMEM((2,), jnp.int32),                # cur arg, stop
            pltpu.SemaphoreType.DMA((2,)),              # frame bufs
            pltpu.SemaphoreType.DMA(()),                # center window
            pltpu.SemaphoreType.DMA((3,)),              # state staging
        ],
        input_output_aliases={8: 0, 9: 1, 10: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(gidx0, max0, i_offset, n_total, dist_cutoff, tmax,
      frames_r, g, dist, assig, tmax)


# ---------------------------------------------------------------------
# per-iteration variant for the SHARDED loop: the center is chosen
# globally (collective argmax across shards), so it arrives as inputs
# (column + G + id + the global md); each shard skips its LOCAL tiles
# under the same Gonzalez bound — d(c_j, c_new) >= md holds for every
# existing center GLOBALLY, so a local tile with tmax <= md/2 is
# provably inert no matter which shard owns the new center.
# ---------------------------------------------------------------------


def _iter_kernel(gb_ref, cid_ref, md_ref, tmax_sin, frames_hbm, g_hbm,
                 dist_hbm, assig_hbm, tmax_in, col_in,
                 dist_out, assig_out, tmax_out, lmax_out, larg_out,
                 skipcnt_out,
                 g_s, fbuf, col_ref, stmax, sem, sem_s,
                 *, a_pad, n_atoms_real, tile, t_pad, approx_recip):
    it = pl.program_id(0)
    n_t = pl.num_programs(0)
    sl = pl.ds(pl.multiple_of(it * tile, tile), tile)
    lanes_t = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)

    @pl.when(it == 0)
    def _():
        tmax_out[:] = tmax_in[:]
        col_ref[:] = col_in[:]

        def body(j, _):
            stmax[j] = tmax_sin[0, j]
            return 0
        jax.lax.fori_loop(0, n_t, body, 0)
        for k, (src, dst) in enumerate(((dist_hbm, dist_out),
                                        (assig_hbm, assig_out),
                                        (g_hbm, g_s))):
            dma = pltpu.make_async_copy(src, dst, sem_s.at[k])
            dma.start()
            dma.wait()
        skippable = ((tmax_out[:] <= 0.5 * md_ref[0, 0])
                     & jnp.isfinite(md_ref[0, 0])
                     & (lanes_t < n_t))
        skipcnt_out[0, 0] = jnp.sum(skippable.astype(jnp.int32))

    md = md_ref[0, 0]
    finite = md < jnp.inf

    def tile_skippable(j):
        return (stmax[j] <= 0.5 * md) & finite

    compute_cur = jnp.logical_not(tile_skippable(it))
    b = jax.lax.rem(it, 2)

    @pl.when(compute_cur & (it == 0))
    def _():
        pltpu.make_async_copy(
            frames_hbm.at[:, sl], fbuf.at[b], sem.at[b]).start()

    nxt = it + 1
    nxt_skip = tile_skippable(jnp.minimum(nxt, n_t - 1))

    @pl.when((nxt < n_t) & jnp.logical_not(nxt_skip))
    def _():
        bn = jax.lax.rem(nxt, 2)
        pltpu.make_async_copy(
            frames_hbm.at[:, pl.ds(pl.multiple_of(nxt * tile, tile),
                                   tile)],
            fbuf.at[bn], sem.at[bn]).start()

    @pl.when(compute_cur)
    def _():
        pltpu.make_async_copy(
            frames_hbm.at[:, sl], fbuf.at[b], sem.at[b]).wait()
        fb = fbuf[b]
        if fb.dtype != jnp.float32:
            fb = fb.astype(jnp.float32)
        S = [[None] * 3 for _ in range(3)]
        for j in range(3):
            for i in range(3):
                fo, co = i * a_pad, j * a_pad
                acc = fb[fo:fo + 8, :] * col_ref[co:co + 8, :]
                for c in range(8, a_pad, 8):
                    acc = acc + (fb[fo + c:fo + c + 8, :]
                                 * col_ref[co + c:co + c + 8, :])
                S[i][j] = jnp.sum(acc, axis=0, keepdims=True)

        gsum = g_s[:, sl] + gb_ref[0, 0]
        Sc = tuple(S[i][j] for i in range(3) for j in range(3))
        d_new = qcp.rmsd_from_S_components_unrolled(
            Sc, gsum, n_atoms_real, approx_recip=approx_recip)

        old_d = dist_out[:, sl]
        upd = d_new < old_d
        nd = jnp.where(upd, d_new, old_d)
        dist_out[:, sl] = nd
        assig_out[:, sl] = jnp.where(upd, cid_ref[0, 0],
                                     assig_out[:, sl])
        m = jnp.max(nd)
        tmax_out[:] = jnp.where(lanes_t == it, m, tmax_out[:])
        stmax[it] = m

    @pl.when(it == n_t - 1)
    def _():
        # this shard's (max, first argmax) of the updated distances,
        # for the cross-shard collective
        m = jnp.max(tmax_out[:])
        win_t = jnp.min(jnp.where(tmax_out[:] == m, lanes_t, _IMAX))
        row = dist_out[:, pl.ds(pl.multiple_of(win_t * tile, tile),
                                tile)]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        lmax_out[0, 0] = m
        larg_out[0, 0] = win_t * tile + jnp.min(
            jnp.where(row == m, lanes, _IMAX))


@functools.partial(jax.jit,
                   static_argnames=('n_atoms_real', 'interpret',
                                    'tile'))
def kcenters_iteration_skip_pallas(frames_r, g, dist, assig, tmax,
                                   col, g_center, center_id, md,
                                   n_atoms_real, interpret=False,
                                   tile=2048):
    """One k-centers iteration with tile-granular DMA skipping against
    a GLOBALLY chosen center (the sharded loop's building block).

    Parameters
    ----------
    frames_r, g, dist, assig : as in
        :func:`..qcp_update_pallas.kcenters_iteration_pallas` (local
        shard arrays).
    tmax : (1, t_pad) float32 per-tile max carry
        (:func:`tile_summaries` initially, this function's output
        afterwards).
    col : (3*A_pad, 1) float32 — the new center's column (rows
        ``j*A_pad + a``), already broadcast across shards.
    g_center, center_id : (1, 1) scalars.
    md : (1, 1) float32 — the GLOBAL max distance that selected this
        center (the Gonzalez bound's reference value).

    Returns ``(dist, assig, tmax, lmax (1,1), largmax (1,1),
    skipcnt (1,1))`` — lmax/largmax are this shard's max and FIRST
    local argmax of the updated distances.
    """
    rows, n = frames_r.shape
    a_pad = rows // 3
    n_tiles = n // tile
    t_pad = skip_t_pad(n_tiles)
    assert tmax.shape == (1, t_pad), (tmax.shape, t_pad)
    kernel = functools.partial(_iter_kernel, a_pad=a_pad,
                               n_atoms_real=float(n_atoms_real),
                               tile=tile, t_pad=t_pad,
                               approx_recip=True)

    smem11 = pl.BlockSpec((1, 1), lambda it: (0, 0),
                          memory_space=pltpu.SMEM)
    whole = lambda shape: pl.BlockSpec(shape, lambda it: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            smem11,                                     # center G
            smem11,                                     # center id
            smem11,                                     # global md
            pl.BlockSpec((1, t_pad), lambda it: (0, 0),
                         memory_space=pltpu.SMEM),      # tmax (SMEM)
            pl.BlockSpec(memory_space=pl.ANY),          # frames HBM
            pl.BlockSpec(memory_space=pl.ANY),          # g HBM
            pl.BlockSpec(memory_space=pl.ANY),          # dist HBM
            pl.BlockSpec(memory_space=pl.ANY),          # assig HBM
            whole((1, t_pad)),                          # tmax in
            whole((rows, 1)),                           # center col
        ],
        out_specs=[
            whole((1, n)),                              # dist state
            whole((1, n)),                              # assig state
            whole((1, t_pad)),                          # tmax out
            smem11,                                     # local max
            smem11,                                     # local argmax
            smem11,                                     # skip count
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # g state
            pltpu.VMEM((2, rows, tile), frames_r.dtype),  # frame bufs
            pltpu.VMEM((rows, 1), jnp.float32),         # center col
            pltpu.SMEM((t_pad,), jnp.float32),          # tile maxes
            pltpu.SemaphoreType.DMA((2,)),              # frame bufs
            pltpu.SemaphoreType.DMA((3,)),              # state staging
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(g_center, center_id, md, tmax, frames_r, g, dist, assig, tmax,
      col)
