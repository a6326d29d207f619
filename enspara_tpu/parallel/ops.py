"""In-jit collective vocabulary — the device-mesh replacement for the
reference's MPI op set (enspara/mpi/ops.py; SURVEY.md §2.4).

Mapping from the reference's collectives to mesh collectives:

================================  =====================================
reference (mpi4py)                here (inside shard_map over 'frames')
================================  =====================================
allreduce(MAX) striped max        ``striped_max`` (lax.pmax)
allreduce(SUM) striped mean       ``striped_mean`` (lax.psum of sums)
allgather of local argmax/max     ``global_argmax`` (all_gather + tie
                                  break to the smallest global index,
                                  matching np.argmax first-max)
Bcast frame from owner rank       ``distribute_frame`` (one-hot psum)
assemble_striped_array            plain ``jax.device_get`` — arrays are
                                  globally addressable under jax
================================  =====================================

These helpers are called *inside* ``shard_map`` bodies; each operates on
the local shard and returns replicated results.
"""

import jax
import jax.numpy as jnp

from .mesh import FRAME_AXIS

__all__ = ['striped_max', 'striped_mean', 'global_argmax',
           'distribute_frame', 'local_shard_bounds']


def local_shard_bounds(n_local, axis=FRAME_AXIS):
    """(start, stop) global indices of this shard's rows, assuming
    contiguous block striping (jax's default for a sharded leading
    axis)."""
    idx = jax.lax.axis_index(axis)
    start = idx * n_local
    return start, start + n_local


def striped_max(x_local, axis=FRAME_AXIS):
    """Global max of a frame-sharded vector (reference:
    mpi/ops.py:128 striped_array_max)."""
    return jax.lax.pmax(jnp.max(x_local), axis)


def striped_mean(x_local, weight_local=None, axis=FRAME_AXIS):
    """Global mean of a frame-sharded vector, optionally masked
    (reference: mpi/ops.py:143 striped_array_mean)."""
    if weight_local is None:
        s = jax.lax.psum(jnp.sum(x_local), axis)
        n = jax.lax.psum(jnp.asarray(x_local.size, jnp.float32), axis)
    else:
        s = jax.lax.psum(jnp.sum(x_local * weight_local), axis)
        n = jax.lax.psum(jnp.sum(weight_local), axis)
    return s / n


def global_argmax(x_local, axis=FRAME_AXIS):
    """(value, global_index) of the global maximum of a frame-sharded
    vector, breaking ties toward the smallest global index so results
    bit-match the serial ``np.argmax`` (SURVEY.md 'hard parts').

    Assumes contiguous block striping of the global array.
    """
    n_local = x_local.shape[0]
    local_arg = jnp.argmax(x_local)
    local_max = x_local[local_arg]
    start, _ = local_shard_bounds(n_local, axis)
    global_arg = start + local_arg

    vals = jax.lax.all_gather(local_max, axis)    # (n_shards,)
    args = jax.lax.all_gather(global_arg, axis)   # (n_shards,)
    best = jnp.max(vals)
    # ties -> smallest global index
    winner_idx = jnp.min(jnp.where(vals == best, args,
                                   jnp.iinfo(jnp.int32).max))
    return best, winner_idx


def distribute_frame(data_local, global_index, axis=FRAME_AXIS):
    """Fetch row ``global_index`` of a frame-sharded array onto every
    shard (reference: mpi/ops.py:169 distribute_frame, a Bcast from the
    owner rank). Implemented as owner-masked dynamic-slice + psum."""
    n_local = data_local.shape[0]
    start, stop = local_shard_bounds(n_local, axis)
    owned = (global_index >= start) & (global_index < stop)
    local_idx = jnp.clip(global_index - start, 0, n_local - 1)
    row = jax.lax.dynamic_index_in_dim(data_local, local_idx, axis=0,
                                       keepdims=False)
    contrib = jnp.where(owned, row.astype(jnp.float32),
                        jnp.zeros_like(row, jnp.float32))
    return jax.lax.psum(contrib, axis)
