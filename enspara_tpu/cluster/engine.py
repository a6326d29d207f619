"""Device clustering engine.

The reference's k-centers outer loop is a stateful Python loop with MPI
collectives per iteration (enspara/cluster/kcenters.py:217-231, :314-378).
Here the whole loop is ONE jitted ``lax.while_loop`` executed under
``shard_map`` over the frame mesh:

* frames (features or centered coordinates) are block-sharded on axis 0,
* the global farthest-point search is an ``all_gather`` of per-shard
  (max, argmax) pairs with first-max tie-breaking (bit-parity with the
  serial ``np.argmax``),
* the new center is broadcast via an owner-masked dynamic-slice + psum
  (replacing ``mpi.ops.distribute_frame``),
* the centers buffer is preallocated at ``k_max`` (static shape), the
  data-dependent stop (``dist_cutoff``/``n_clusters``) lives in the
  while-loop condition.

Padding frames carry ``distance = -inf`` so they are never selected as a
center, never counted in the stopping criterion, and keep assignment -1.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as pmesh
from ..parallel import ops as pops
from ..parallel.mesh import FRAME_AXIS, P
from ..ops import qcp

NEG_INF = -jnp.inf

__all__ = ['kcenters_device', 'assign_device', 'KCentersDeviceResult']


# ---------------------------------------------------------------------
# metric backends: distance of every local frame to one replicated frame
# ---------------------------------------------------------------------

def _euclidean_to(local, frame):
    d = local - frame[None]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def _manhattan_to(local, frame):
    return jnp.sum(jnp.abs(local - frame[None]), axis=-1)


def _hamming_to(local, frame):
    return jnp.mean((local != frame[None]).astype(jnp.float32), axis=-1)


def _rmsd_to(local, frame):
    """local: (m, N, 3) centered; frame: (N, 3) centered."""
    g_local = jnp.sum(local * local, axis=(-2, -1))
    g_frame = jnp.sum(frame * frame)
    return qcp.qcp_rmsd_vector(local, frame, g_local, g_frame)


_METRIC_TO_FRAME = {
    'euclidean': _euclidean_to,
    'manhattan': _manhattan_to,
    'cityblock': _manhattan_to,
    'hamming': _hamming_to,
    'rmsd': _rmsd_to,
}


def _flatten_for_bcast(row):
    return row.reshape(-1)


class KCentersDeviceResult(NamedTuple):
    distances: np.ndarray       # (n,) float32
    assignments: np.ndarray     # (n,) int64
    center_indices: np.ndarray  # (n_found,) int64 global frame indices
    n_found: int


def _kcenters_local_loop(data_local, distances, assignments,
                         n_start, n_clusters, dist_cutoff, k_max,
                         metric):
    """shard_map body: runs the full k-centers while_loop on this shard,
    communicating via mesh collectives. Returns final local state plus
    the replicated center-index buffer."""
    dist_fn = _METRIC_TO_FRAME[metric]
    frame_shape = data_local.shape[1:]
    flat_len = int(np.prod(frame_shape))

    ctr_inds = jnp.full((k_max,), -1, jnp.int32)

    def fetch_frame(gidx):
        flat_local = data_local.reshape(data_local.shape[0], flat_len)
        row = pops.distribute_frame(flat_local, gidx)
        return row.reshape(frame_shape).astype(data_local.dtype)

    def maxdist(distances):
        return pops.striped_max(distances)

    def cond(state):
        i, dists, _, _, md = state
        return (i < n_clusters) & (md > dist_cutoff)

    def step(state):
        i, dists, assigs, ctrs, _ = state
        _, gidx = pops.global_argmax(dists)
        ctrs = ctrs.at[i].set(gidx.astype(jnp.int32))
        frame = fetch_frame(gidx)
        d_new = dist_fn(data_local, frame)
        upd = d_new < dists
        dists = jnp.where(upd, d_new, dists)
        assigs = jnp.where(upd, i, assigs)
        return (i + 1, dists, assigs, ctrs, maxdist(dists))

    init = (jnp.asarray(n_start, jnp.int32), distances, assignments,
            ctr_inds, maxdist(distances))
    i, dists, assigs, ctrs, _ = jax.lax.while_loop(cond, step, init)
    return dists, assigs, ctrs, jnp.full((distances.shape[0],), i,
                                         jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=('k_max', 'metric', 'mesh'))
def _kcenters_sharded(data, distances, assignments, n_start, n_clusters,
                      dist_cutoff, k_max, metric, mesh):
    body = functools.partial(
        _kcenters_local_loop, k_max=k_max, metric=metric)
    spec = P(FRAME_AXIS)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P(), P()),
        out_specs=(spec, spec, P(), spec),
        check_vma=False,
    )(data, distances, assignments, n_start, n_clusters, dist_cutoff)


def _prepare_data(X, metric):
    """Host prep: for 'rmsd', center coordinates (QCP requires it and it
    matches the reference's precentering, cluster/util.py:625)."""
    X = np.asarray(X)
    if metric == 'rmsd':
        if X.ndim != 3 or X.shape[-1] != 3:
            raise ValueError("metric='rmsd' requires (n, n_atoms, 3) "
                             "coordinates, got %s" % (X.shape,))
        X = X.astype(np.float32)
        X = X - X.mean(axis=1, keepdims=True)
    elif metric == 'hamming':
        X = X.astype(np.int32)
    else:
        X = X.astype(np.float32)
    return X


def kcenters_device(X, metric='euclidean', n_clusters=None,
                    dist_cutoff=None, k_max=None,
                    init_distances=None, init_assignments=None,
                    n_init_centers=0, init_center_indices=None,
                    mesh=None):
    """Run the sharded device k-centers loop.

    Parameters mirror the reference's ``kcenters()``
    (enspara/cluster/kcenters.py:108); ``X`` is an ndarray of features
    (n, d) or coordinates (n, n_atoms, 3) for ``metric='rmsd'``.
    """
    if mesh is None:
        mesh = pmesh.frame_mesh()
    if metric not in _METRIC_TO_FRAME:
        raise ValueError('device engine supports metrics %s, got %r'
                         % (sorted(_METRIC_TO_FRAME), metric))

    n = len(X)
    if n_clusters is None and dist_cutoff is None:
        raise ValueError("Either n_clusters or dist_cutoff is required")
    if k_max is None:
        k_max = int(n_clusters) if n_clusters is not None else n
    k_max = int(min(k_max, n))
    n_clusters_eff = np.int32(min(n_clusters or n, k_max))
    cutoff_eff = np.float32(dist_cutoff if dist_cutoff is not None
                            else 0.0)

    data = _prepare_data(X, metric)
    data_sh, _ = pmesh.shard_frames(data, mesh)
    n_pad = data_sh.shape[0]

    if init_distances is None:
        distances = np.full(n_pad, np.inf, np.float32)
        assignments = np.full(n_pad, -1, np.int32)
    else:
        distances = np.full(n_pad, np.inf, np.float32)
        distances[:n] = init_distances
        assignments = np.full(n_pad, -1, np.int32)
        assignments[:n] = init_assignments
    distances[n:] = NEG_INF

    dist_sh, _ = pmesh.shard_frames(distances, mesh)
    assig_sh, _ = pmesh.shard_frames(assignments, mesh)

    dists, assigs, ctrs, n_found = _kcenters_sharded(
        data_sh, dist_sh, assig_sh,
        np.int32(n_init_centers), n_clusters_eff, cutoff_eff,
        k_max, metric, mesh)

    dists = np.asarray(dists)[:n].astype(np.float64)
    assigs = np.asarray(assigs)[:n].astype(np.int64)
    n_found = int(np.asarray(n_found)[0])
    ctr_inds = np.asarray(ctrs)[:n_found].astype(np.int64)
    if init_center_indices is not None:
        ctr_inds[:n_init_centers] = init_center_indices
    return KCentersDeviceResult(dists, assigs, ctr_inds, n_found)


# ---------------------------------------------------------------------
# batched assignment: every frame to its nearest center
# ---------------------------------------------------------------------

def _assign_local(data_local, centers, metric, center_block=512):
    """Distances of local frames to all centers, blocked over centers to
    bound memory; returns (assignments, distances) for the shard."""
    dist_fn = _METRIC_TO_FRAME[metric]

    def to_center(c):
        return dist_fn(data_local, c)

    d_all = jax.lax.map(to_center, centers,
                        batch_size=min(center_block, centers.shape[0]))
    # d_all: (k, m) -> nearest center per frame (first-min tie break,
    # matching the reference's strict-< update loop)
    assigs = jnp.argmin(d_all, axis=0).astype(jnp.int32)
    dists = jnp.min(d_all, axis=0)
    return assigs, dists


@functools.partial(jax.jit, static_argnames=('metric', 'mesh'))
def _assign_sharded(data, centers, metric, mesh):
    body = functools.partial(_assign_local, metric=metric)
    spec = P(FRAME_AXIS)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, spec),
        check_vma=False,
    )(data, centers)


def assign_device(X, centers, metric='euclidean', mesh=None):
    """Assign every frame to its nearest center on the mesh — the
    batched device form of the reference's ``assign_to_nearest_center``
    (enspara/cluster/util.py:159).

    Returns ``(assignments (n,), distances (n,))`` as numpy arrays.
    """
    if mesh is None:
        mesh = pmesh.frame_mesh()
    n = len(X)
    data = _prepare_data(X, metric)
    centers = _prepare_data(np.asarray(centers), metric)
    data_sh, _ = pmesh.shard_frames(data, mesh)
    centers_r = pmesh.replicated(centers, mesh)
    assigs, dists = _assign_sharded(data_sh, centers_r, metric, mesh)
    return (np.asarray(assigs)[:n].astype(np.int64),
            np.asarray(dists)[:n].astype(np.float64))
