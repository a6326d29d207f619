"""Fused k-centers iteration kernel (EXPERIMENTAL — not the default).

Status: correct (interpret-mode parity test) but currently ~3x slower
than the XLA global-view loop on v5e. Root causes identified for the
next optimization round: (1, n)-shaped per-frame scalars force T(8,128)
tiling that physically inflates dist/assig/g reads 128x, and atom
padding to 128 lanes doubles the frame read when n_atoms <= 64. Fixing
requires (n/128, 128)-blocked scalar layouts inside the kernel.

One Pallas call per k-centers iteration performs, per frame block:
RMSD-to-new-center (3 MXU matvecs + VPU Newton), the strict-< min
update of (distances, assignments), and a per-block (max, argmax)
partial reduction — so each iteration reads the frame set exactly once
and writes only the updated state. The tiny cross-block argmax and the
center gather stay in XLA.

This removes the d_new array, the (n, 3, 3) S intermediate, and the
separate full-length argmax pass of the XLA loop — the remaining
traffic is the irreducible frame read.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import qcp

__all__ = ['kcenters_iteration_pallas']

TILE_N = 1024


def _kernel(center_ref, i_ref, ft_ref, g_ref, dist_ref, assig_ref,
            dist_out, assig_out, *, n_atoms_real):
    """center_ref: (3, 1, A); i_ref: (1, 1) int32 (current center id);
    ft_ref: (3, TILE, A); g_ref/(dist|assig)_ref: (TILE, 1);
    outputs: updated dist/assig (aliased into the inputs)."""
    # S components: S[i][j] = sum_a ft[i, n, a] * center[j, a].
    # One output column per component -> multiply+reduce on the VPU
    # (an MXU matvec would idle 127/128 of the array).
    S = [[None] * 3 for _ in range(3)]
    for i in range(3):
        fi = ft_ref[i]                                 # (TILE, A)
        for j in range(3):
            cj = center_ref[j]                          # (1, A)
            S[i][j] = jnp.sum(fi * cj, axis=1,
                              keepdims=True)            # (TILE, 1)

    Sxx, Sxy, Sxz = S[0]
    Syx, Syy, Syz = S[1]
    Szx, Szy, Szz = S[2]

    ga = g_ref[:]                                       # (TILE, 1)
    gb = jnp.sum(center_ref[:] * center_ref[:])
    gsum = ga + gb
    lam0 = gsum * 0.5
    inv = 1.0 / jnp.maximum(lam0, 1e-30)

    fnorm2 = (Sxx * Sxx + Sxy * Sxy + Sxz * Sxz
              + Syx * Syx + Syy * Syy + Syz * Syz
              + Szx * Szx + Szy * Szy + Szz * Szz)
    det = (Sxx * (Syy * Szz - Syz * Szy)
           - Sxy * (Syx * Szz - Syz * Szx)
           + Sxz * (Syx * Szy - Syy * Szx))

    SxzpSzx = Sxz + Szx
    SxzmSzx = Sxz - Szx
    SyzpSzy = Syz + Szy
    SyzmSzy = Syz - Szy
    SxypSyx = Sxy + Syx
    SxymSyx = Sxy - Syx
    SxxpSyy = Sxx + Syy
    SxxmSyy = Sxx - Syy

    D = Sxy * Sxy + Sxz * Sxz - Syx * Syx - Szx * Szx
    D = D * D
    core = -Sxx * Sxx + Syy * Syy + Szz * Szz + Syz * Syz + Szy * Szy
    E = (core - 2.0 * (Syy * Szz - Syz * Szy)) \
        * (core + 2.0 * (Syy * Szz - Syz * Szy))
    F = (-(SxzpSzx) * (SyzmSzy) + (SxymSyx) * (SxxmSyy - Szz)) \
        * (-(SxzmSzx) * (SyzpSzy) + (SxymSyx) * (SxxmSyy + Szz))
    G = (-(SxzpSzx) * (SyzpSzy) - (SxypSyx) * (SxxpSyy - Szz)) \
        * (-(SxzmSzx) * (SyzmSzy) - (SxypSyx) * (SxxpSyy + Szz))
    H = ((SxypSyx) * (SyzpSzy) + (SxzpSzx) * (SxxmSyy + Szz)) \
        * (-(SxymSyx) * (SyzmSzy) + (SxzpSzx) * (SxxpSyy + Szz))
    II = ((SxypSyx) * (SyzmSzy) + (SxzmSzx) * (SxxmSyy - Szz)) \
        * (-(SxymSyx) * (SyzpSzy) + (SxzmSzx) * (SxxpSyy - Szz))
    C0 = D + E + F + G + H + II

    inv2 = inv * inv
    c2 = (-2.0 * fnorm2) * inv2
    c1 = (-8.0 * det) * inv2 * inv
    c0 = C0 * inv2 * inv2

    u = jnp.ones_like(c2)
    for _ in range(qcp.NEWTON_ITERS):
        u2 = u * u
        p = u2 * u2 + c2 * u2 + c1 * u + c0
        dp = u * (4.0 * u2 + 2.0 * c2) + c1
        step = p / jnp.where(jnp.abs(dp) < 1e-12, 1e-12, dp)
        u = u - jnp.clip(step, -0.5, 0.5)
    u = jnp.clip(u, 0.0, 1.0)

    d_new = jnp.sqrt(jnp.maximum(gsum - 2.0 * u * lam0, 0.0)
                     / n_atoms_real)                    # (TILE, 1)

    old_d = dist_ref[:]
    old_a = assig_ref[:]
    upd = d_new < old_d
    new_d = jnp.where(upd, d_new, old_d)
    new_a = jnp.where(upd, i_ref[0, 0], old_a)
    dist_out[:] = new_d
    assig_out[:] = new_a


@functools.partial(jax.jit,
                   static_argnames=('n_atoms_real', 'interpret',
                                    'tile'))
def kcenters_iteration_pallas(frames_t, g, dist, assig, center,
                              center_id, n_atoms_real,
                              interpret=False, tile=TILE_N):
    """One fused k-centers iteration.

    Parameters
    ----------
    frames_t : (3, n, A) transposed, centered coordinates (n divisible
        by TILE_N, A by 128).
    g : (n, 1) per-frame G values.
    dist, assig : (n, 1) current state (dist of padded rows = -inf).
    center : (3, 1, A) the newly selected center, centered.
    center_id : (1, 1) int32 — the id to assign newly-claimed frames.

    Returns ``(dist, assig)`` (aliased into the inputs).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = tile
    _, n, A = frames_t.shape
    grid = (n // TILE,)
    kernel = functools.partial(_kernel,
                               n_atoms_real=float(n_atoms_real))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 1, A), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),      # center
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # center id
            pl.BlockSpec((3, TILE, A), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),      # frames
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # g
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # dist
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # assig
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(center, center_id, frames_t, g, dist, assig)
