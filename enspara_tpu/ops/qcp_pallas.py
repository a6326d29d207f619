"""Fused Pallas TPU kernel for pairwise QCP RMSD.

The XLA path (ops/qcp.py) materializes the (F, C, 3, 3) inner-product
tensor in HBM between the matmul and the Newton stage — 9x the output
bytes. This kernel fuses both: each grid cell loads a (TF, N) x (TC, N)
tile of frames/centers into VMEM, runs the nine (TF, N)x(N, TC) MXU
contractions for the S-matrix components, solves the quartic on the VPU,
and writes only the (TF, TC) RMSD block.

Inputs are pre-transposed to (3, n, N) so each component contraction is
a clean lane-aligned matmul. Atom counts pad to a multiple of 128.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import qcp

__all__ = ['qcp_rmsd_matrix_pallas', 'pallas_available']

TILE_F = 256
TILE_C = 256


def pallas_available():
    try:
        from jax.experimental import pallas  # noqa: F401
        return jax.default_backend() in ('tpu',)
    except Exception:
        return False


def _kernel(ft_ref, ct_ref, gf_ref, gc_ref, out_ref, *, n_atoms_real,
            precision):
    """ft_ref: (3, TF, N) frames tile; ct_ref: (3, TC, N) centers tile;
    gf_ref: (TF, 1); gc_ref: (TC, 1); out_ref: (TF, TC)."""
    S = [[None] * 3 for _ in range(3)]
    for i in range(3):
        fi = ft_ref[i]                       # (TF, N)
        for j in range(3):
            cj = ct_ref[j]                   # (TC, N)
            S[i][j] = jax.lax.dot_general(
                fi, cj,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                  # (TF, TC)

    gsum = gf_ref[:] + gc_ref[:].reshape(1, -1)        # (TF, TC)
    Sc = tuple(S[i][j] for i in range(3) for j in range(3))
    # NOTE: approx_recip measured SLOWER here (1.30 -> 1.15B pairs/s
    # at 131k x 512): on full-sublane (TF, TC) shapes the plain divide
    # lowers better. The (1, TILE)-row kernels are the ones it helps.
    out_ref[:] = qcp.rmsd_from_S_components_unrolled(
        Sc, gsum, n_atoms_real)


@functools.partial(jax.jit,
                   static_argnames=('n_atoms_real', 'interpret',
                                    'precision'))
def _call_pallas(frames_t, centers_t, g_f, g_c, n_atoms_real,
                 interpret=False, precision='highest'):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, F, N = frames_t.shape
    _, C, _ = centers_t.shape

    # narrow center blocks (PAM proposal batches, cache-init chunks)
    # use a matching narrow tile: padding C=64 up to a 256-wide tile
    # would compute 4x the pair-slots for the same answer
    tile_c = min(TILE_C, C)
    grid = (F // TILE_F, C // tile_c)
    kernel = functools.partial(_kernel, n_atoms_real=float(n_atoms_real),
                               precision=jax.lax.Precision(precision))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_F, N), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_c, N), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_F, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_F, tile_c),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * F * C * N + 50 * F * C,
            bytes_accessed=(3 * F * N + 3 * C * N + F * C) * 4,
            transcendentals=F * C,
        ),
        interpret=interpret,
    )(frames_t, centers_t, g_f, g_c)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def qcp_rmsd_matrix_pallas(frames, centers, g_frames=None,
                           g_centers=None, n_atoms=None,
                           interpret=None, precision='highest'):
    """All-pairs minimum RMSD via the fused kernel.

    Parameters mirror :func:`enspara_tpu.ops.qcp.qcp_rmsd_matrix`;
    structures must be pre-centered. Pads frames/centers/atoms to tile
    boundaries internally and slices the result.
    """
    frames = jnp.asarray(frames, jnp.float32)
    centers = jnp.asarray(centers, jnp.float32)
    F, N = frames.shape[0], frames.shape[1]
    C = centers.shape[0]
    if n_atoms is None:
        n_atoms = N
    if g_frames is None:
        g_frames = jnp.sum(frames * frames, axis=(-2, -1))
    if g_centers is None:
        g_centers = jnp.sum(centers * centers, axis=(-2, -1))

    Fp = _round_up(F, TILE_F)
    # narrow center sets pad only to the 64-sublane granularity the
    # adaptive tile needs, not to a full 256 tile
    Cp = _round_up(C, 64) if C < TILE_C else _round_up(C, TILE_C)
    Np = _round_up(N, 128)

    frames_t = jnp.transpose(frames, (2, 0, 1))   # (3, F, N)
    centers_t = jnp.transpose(centers, (2, 0, 1))
    frames_t = jnp.pad(frames_t, ((0, 0), (0, Fp - F), (0, Np - N)))
    centers_t = jnp.pad(centers_t, ((0, 0), (0, Cp - C), (0, Np - N)))
    # padded structures need positive G so lam0 > 0 (rmsd rows/cols are
    # sliced away)
    gf = jnp.pad(jnp.asarray(g_frames, jnp.float32), (0, Fp - F),
                 constant_values=1.0).reshape(-1, 1)
    gc = jnp.pad(jnp.asarray(g_centers, jnp.float32), (0, Cp - C),
                 constant_values=1.0).reshape(-1, 1)

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    out = _call_pallas(frames_t, centers_t, gf, gc, int(n_atoms),
                       interpret=bool(interpret), precision=precision)
    return out[:F, :C]
