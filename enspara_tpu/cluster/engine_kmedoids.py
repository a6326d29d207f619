"""Fully-on-device k-medoids (PAM) sweeps.

The host path (cluster/kmedoids.py) dispatches ~3k device calls per
sweep; here the ENTIRE sweep — proposal sampling, distance kernel,
3-case update, ambiguous-subset reassignment, cost test — is one jitted
``lax.fori_loop`` over medoids.

Exactness under static shapes: the reference recomputes nearest medoids
only for the 'ambiguous' frames (assigned to the replaced medoid whose
distance increased, kmedoids.py:637-670) — a dynamic-size set. We
gather those frames into a fixed-size bucket of ``M = bucket_factor *
n/k`` slots. When the true ambiguous count fits the bucket (tracked in
``overflow``), the update is exactly PAM; overflow cases fall back to
keeping the proposal rejected for safety.

Randomness uses jax PRNG (uniform over the proposal cluster's members,
reproducing the reference's `_propose_new_center_amongst` semantics,
kmedoids.py:482) — deterministic for a given key and independent of
mesh shape (SURVEY.md 'hard parts').
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import engine

__all__ = ['kmedoids_sweeps_device']


@functools.partial(
    jax.jit, static_argnames=('metric', 'n_sweeps', 'bucket',
                              'use_fused'))
def _pam_sweeps(data, valid, d1, a1, medoid_inds, key, metric,
                n_sweeps, bucket, use_fused=False):
    n = data.shape[0]
    k = medoid_inds.shape[0]

    if use_fused:
        # TPU: the proposal-distance pass reuses the fused k-centers
        # iteration kernel — called with dist=+inf it degenerates to a
        # pure distance computation over the dense (3*A_pad, n) layout
        # (one bandwidth-bound pass instead of the XLA conv emitter).
        from ..ops.qcp_update_pallas import (kcenters_iteration_pallas,
                                             TILE_N)
        A = data.shape[1]
        A_pad = ((A + 7) // 8) * 8
        n_pad = ((n + TILE_N - 1) // TILE_N) * TILE_N
        frames_r = jnp.pad(jnp.transpose(data, (2, 1, 0)),
                           ((0, 0), (0, A_pad - A), (0, n_pad - n))) \
            .reshape(3 * A_pad, n_pad)
        g_row = jnp.pad(jnp.sum(data * data, axis=(1, 2)),
                        (0, n_pad - n),
                        constant_values=1.0).reshape(1, -1)
        rows = 3 * A_pad
        inf_d = jnp.full((1, n_pad), jnp.inf, jnp.float32)
        zero_a = jnp.zeros((1, n_pad), jnp.int32)

        def dist_fn(_, p_idx):
            col = jax.lax.dynamic_slice(frames_r, (0, p_idx),
                                        (rows, 1))
            cvec = col.reshape(3, A_pad).T
            gb = jax.lax.dynamic_slice(g_row, (0, p_idx), (1, 1))
            cid0 = jnp.zeros((1, 1), jnp.int32)
            dnew, _ = kcenters_iteration_pallas(
                frames_r, g_row, inf_d, zero_a, cvec, gb, cid0, A)
            return dnew[0, :n]
    else:
        to_frame = engine._METRIC_TO_FRAME[metric]

        def dist_fn(data_, p_idx):
            return to_frame(data_, data_[p_idx])

    def cost(d):
        return jnp.sum(jnp.where(valid, d * d, 0.0)) / jnp.sum(valid)

    def one_proposal(cid, state):
        d1, a1, medoid_inds, rbits = state

        members = (a1 == cid) & valid
        count = jnp.sum(members)

        # uniform member in ONE pass: the argmax of iid random
        # priorities over the member set is uniform on it. The random
        # bits are drawn once per sweep (threefry over 1M elements
        # costs ~5 ms) and remixed per proposal with a Weyl/murmur
        # step; |1 keeps every member's priority above the 0 sentinel.
        mixed = rbits ^ (jnp.uint32(0x9E3779B9) *
                         cid.astype(jnp.uint32))
        mixed = mixed * jnp.uint32(0x85EBCA6B)
        prio = jnp.where(members, mixed | jnp.uint32(1), jnp.uint32(0))
        p_idx = jnp.argmax(prio).astype(jnp.int32)

        pc = data[p_idx]
        dnew = dist_fn(data, p_idx)

        dst_dn = (d1 > dnew) & valid
        dst_up_this = (d1 <= dnew) & (a1 == cid) & valid

        # fixed-size bucket of ambiguous frames. top_k on the mask is
        # ~3x faster than jnp.nonzero(size=...) on TPU (no cumsum) and
        # its tie-break is the lowest index, so the bucket holds the
        # first `bucket` ambiguous frames; unused slots are filtered
        # by amb_real below.
        amb_idx = jax.lax.top_k(dst_up_this.astype(jnp.float32),
                                bucket)[1].astype(jnp.int32)
        amb_real = dst_up_this[amb_idx]
        overflow = jnp.sum(dst_up_this) > bucket

        sub = data[amb_idx]                         # (bucket, ...)
        medoids = data[medoid_inds].at[cid].set(pc)  # (k, ...)
        d_amb = engine._pairwise_block(sub, medoids, metric)
        amb_a = jnp.argmin(d_amb, axis=1).astype(jnp.int32)
        amb_d = jnp.min(d_amb, axis=1)

        new_d = jnp.where(dst_dn, dnew, d1)
        new_a = jnp.where(dst_dn, cid, a1)
        new_d = new_d.at[amb_idx].set(
            jnp.where(amb_real, amb_d, new_d[amb_idx]))
        new_a = new_a.at[amb_idx].set(
            jnp.where(amb_real, amb_a, new_a[amb_idx]))

        accept = (cost(new_d) < cost(d1)) & (count > 0) & ~overflow
        d1 = jnp.where(accept, new_d, d1)
        a1 = jnp.where(accept, new_a, a1)
        medoid_inds = medoid_inds.at[cid].set(
            jnp.where(accept, p_idx, medoid_inds[cid]))
        return (d1, a1, medoid_inds, rbits)

    def one_sweep(s, state):
        d1, a1, medoid_inds = state
        rbits = jax.random.bits(jax.random.fold_in(key, s), (n,),
                                jnp.uint32)
        d1, a1, medoid_inds, _ = jax.lax.fori_loop(
            0, k, one_proposal, (d1, a1, medoid_inds, rbits))
        return (d1, a1, medoid_inds)

    d1, a1, medoid_inds = jax.lax.fori_loop(
        0, n_sweeps, one_sweep, (d1, a1, medoid_inds))
    return d1, a1, medoid_inds


def kmedoids_sweeps_device(X, metric, assignments, distances,
                           medoid_inds, n_sweeps=5, bucket_factor=8,
                           seed=0, mesh=None):
    """Run ``n_sweeps`` device PAM sweeps from a warm start.

    Parameters
    ----------
    X : (n, d) features or (n, n_atoms, 3) coordinates.
    metric : 'rmsd' | 'euclidean' | 'manhattan' | 'hamming'.
    assignments, distances : warm-start state (e.g. from k-centers).
    medoid_inds : (k,) current medoid frame indices.
    bucket_factor : ambiguous-bucket size in units of n/k.
    seed : jax PRNG seed (deterministic for a given seed).

    Returns ``(medoid_inds, distances, assignments)`` as numpy arrays.
    """
    import jax

    from ..parallel import mesh as pmesh

    if mesh is None:
        mesh = pmesh.frame_mesh()
    n = len(X)
    k = len(medoid_inds)
    bucket = int(min(n, max(64, bucket_factor * ((n + k - 1) // k))))

    data_sh, _ = engine.prepare_sharded(X, metric, mesh)
    n_pad = data_sh.shape[0]

    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    d1 = np.full(n_pad, np.inf, np.float32)
    d1[:n] = distances
    a1 = np.full(n_pad, -1, np.int32)
    a1[:n] = assignments

    d1_sh, _ = pmesh.shard_frames(d1, mesh)
    a1_sh, _ = pmesh.shard_frames(a1, mesh)
    valid_sh, _ = pmesh.shard_frames(valid, mesh)

    use_fused = (metric == 'rmsd' and mesh.size == 1
                 and jax.default_backend() == 'tpu')
    d1_out, a1_out, m_out = _pam_sweeps(
        data_sh, valid_sh, d1_sh, a1_sh,
        jnp.asarray(np.asarray(medoid_inds, dtype=np.int32)),
        jax.random.PRNGKey(seed), metric, int(n_sweeps), bucket,
        use_fused=use_fused)

    return (np.asarray(m_out).astype(np.int64),
            np.asarray(d1_out)[:n].astype(np.float64),
            np.asarray(a1_out)[:n].astype(np.int64))
