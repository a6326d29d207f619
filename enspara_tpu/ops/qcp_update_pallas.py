"""Fused k-centers iteration kernel.

One Pallas call per k-centers iteration performs, per frame block, the
RMSD of every frame to the newly selected center (nine VPU
multiply-reduces over the atom axis + Newton on the QCP quartic) and
the strict-< min update of (distances, assignments) — so each
iteration reads the frame set exactly once and writes only the updated
state.

With ``with_argmax=True`` the kernel also accumulates the NEXT
center's argmax in its epilogue — a per-lane ``(1, tile)`` running
(max, global index) pair in VMEM scratch, reduced to two SMEM scalars
on the last tile (the same scheme the multi-iteration chunk kernel
uses, ops/kcenters_chunk_pallas.py) — so the caller's loop needs no
separate argmax pass over the 4 MB distance row. That pass (an XLA
reduce kernel + its launch inside the while_loop) is most of the
per-center fixed cost on the sharded multi-chip path, where the chunk
kernel cannot run because each iteration's center must be a GLOBAL
argmax agreed across shards (VERDICT r4 item 4). Tie-breaking matches
``np.argmax``: strict ``>`` per lane keeps the earliest tile, and the
final reduce takes the smallest index among maximal lanes.

Layout is everything here (v1 of this kernel was 3x SLOWER than the
XLA loop):

* frames live as ``(3*A_pad, n)`` with the frame axis minormost — rows
  are ``i*A_pad + a`` for coordinate ``i`` of atom ``a``. Both dims
  tile exactly (``3*A_pad`` is a multiple of 8, ``n`` of 128), so the
  768 MB read at n=1M is dense. The natural ``(n, A, 3)`` layout
  tile-pads 3 -> 128 lanes and reads 57x the data.
* per-frame scalars (g, distance, assignment) are ``(1, n)`` rows —
  sublane padding costs 8x on 4 MB arrays (noise), where v1's
  ``(n, 1)`` columns cost 128x lane padding (512 MB per array).
  (A ``(8, n/8)`` sublane-folded variant was tried and measured
  SLOWER — Mosaic's 3D-ref codegen outweighs the packing gain.)
* the MXU is NOT used: with 9 output components the systolic array
  would idle 119/128 of its rows and fp32 needs multiple bf16 passes;
  the ~730 VPU flops/frame sit under the HBM roofline.

Measured on v5e at n=1M, A=64, k=1000: 1.7 s (580M frame-center
pairs/s) vs 3.5 s for the global-view XLA while_loop.

Reference inner loop: enspara/cluster/kcenters.py:314-378 (md.rmsd +
host min update per center); the sharded caller replaces its MPI
allgather/Bcast choreography with mesh collectives.
"""

import functools

import jax
import jax.numpy as jnp

from . import qcp

__all__ = ['kcenters_iteration_pallas', 'TILE_N']

TILE_N = 2048

_IMAX = jnp.iinfo(jnp.int32).max


def _kernel(cvec_ref, gb_ref, i_ref, f_ref, g_ref, dist_ref, assig_ref,
            *rest, a_pad, n_atoms_real, with_argmax):
    """cvec_ref: (A_pad, 3) center coordinates (cvec[a, j] = c[a, j]);
    gb_ref/(i_ref): (1, 1) SMEM scalars (center G, center id);
    f_ref: (3*A_pad, TILE); g/dist/assig refs: (1, TILE);
    outputs: updated dist/assig, aliased into the inputs, plus — in
    argmax mode — the (1, 1) SMEM (max, global argmax) of the updated
    distances, accumulated per-lane in VMEM scratch."""
    if with_argmax:
        (dist_out, assig_out, lmax_out, larg_out,
         vmax_s, varg_s) = rest
    else:
        dist_out, assig_out = rest

    from jax.experimental import pallas as pl

    fb = f_ref[:]                                      # (3A, TILE)
    if fb.dtype != jnp.float32:
        # bf16 streaming mode: frames cross HBM at half width and are
        # upconverted once per block in-register; arithmetic stays fp32
        fb = fb.astype(jnp.float32)

    # S[i][j] = sum_a f[i*A+a, t] * c[a, j] — padding atoms are zero
    # in both operands, so they contribute nothing.
    S = [[None] * 3 for _ in range(3)]
    for j in range(3):
        cj = cvec_ref[:, j:j + 1].astype(jnp.float32)  # (A_pad, 1)
        for i in range(3):
            fi = fb[i * a_pad:(i + 1) * a_pad]         # (A_pad, TILE)
            S[i][j] = jnp.sum(fi * cj, axis=0,
                              keepdims=True)           # (1, TILE)

    gsum = g_ref[:] + gb_ref[0, 0]                     # (1, TILE)
    Sc = tuple(S[i][j] for i in range(3) for j in range(3))
    d_new = qcp.rmsd_from_S_components_unrolled(
        Sc, gsum, n_atoms_real, approx_recip=True)     # (1, TILE)

    old_d = dist_ref[:]
    old_a = assig_ref[:]
    upd = d_new < old_d
    nd = jnp.where(upd, d_new, old_d)
    dist_out[:] = nd
    assig_out[:] = jnp.where(upd, i_ref[0, 0], old_a)

    if with_argmax:
        it = pl.program_id(0)
        n_t = pl.num_programs(0)
        tile = nd.shape[1]

        @pl.when(it == 0)
        def _():
            vmax_s[:] = jnp.full((1, tile), -jnp.inf, jnp.float32)
            varg_s[:] = jnp.zeros((1, tile), jnp.int32)

        # one elementwise compare/select per tile; the cross-lane
        # scalar reduce runs once on the last tile
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        better = nd > vmax_s[:]
        vmax_s[:] = jnp.where(better, nd, vmax_s[:])
        varg_s[:] = jnp.where(better, it * tile + lanes, varg_s[:])

        @pl.when(it == n_t - 1)
        def _():
            m = jnp.max(vmax_s[:])
            lmax_out[0, 0] = m
            larg_out[0, 0] = jnp.min(jnp.where(vmax_s[:] == m,
                                               varg_s[:], _IMAX))


@functools.partial(jax.jit,
                   static_argnames=('n_atoms_real', 'interpret',
                                    'tile', 'with_argmax'))
def kcenters_iteration_pallas(frames_r, g, dist, assig, cvec, g_center,
                              center_id, n_atoms_real,
                              interpret=False, tile=TILE_N,
                              with_argmax=False):
    """One fused k-centers iteration.

    Parameters
    ----------
    frames_r : (3*A_pad, n) centered coordinates, rows ``i*A_pad + a``
        (n divisible by ``tile``, A_pad by 8; padding entries zero).
    g : (1, n) per-frame G values.
    dist, assig : (1, n) current state (dist of padded frames = -inf).
    cvec : (A_pad, 3) the newly selected center's coordinates.
    g_center : (1, 1) float32 — the center's G value.
    center_id : (1, 1) int32 — the id to assign newly-claimed frames.
    with_argmax : also return the updated distances' (max, argmax),
        accumulated in the kernel epilogue (see module docstring).

    Returns ``(dist, assig)`` (aliased into the inputs), plus
    ``(lmax (1, 1) float32, largmax (1, 1) int32)`` in argmax mode.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = tile
    rows, n = frames_r.shape
    a_pad = rows // 3
    grid = (n // TILE,)
    kernel = functools.partial(_kernel, a_pad=a_pad,
                               n_atoms_real=float(n_atoms_real),
                               with_argmax=with_argmax)

    out_specs = [
        pl.BlockSpec((1, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
    ]
    scratch_shapes = []
    if with_argmax:
        out_specs += [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # lane max
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # lane argmax
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ]
        scratch_shapes = [
            pltpu.VMEM((1, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.int32),
        ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a_pad, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # center coords
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # center G
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # center id
            pl.BlockSpec((rows, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # frames
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # g
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # dist
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # assig
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cvec, g_center, center_id, frames_r, g, dist, assig)
