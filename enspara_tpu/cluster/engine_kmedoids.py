"""Fully-on-device k-medoids (PAM) sweeps.

The host path (cluster/kmedoids.py) dispatches ~3k device calls per
sweep; here the ENTIRE sweep — proposal sampling, distance kernel,
cost test, cache maintenance — is one jitted ``lax.fori_loop`` over
medoids.

FastPAM-style second-nearest cache: alongside the nearest-medoid state
``(d1, a1)`` we carry the exact second-nearest ``(d2, a2)``. A
proposal replacing medoid ``cid`` with candidate ``c`` then costs ONE
distance pass plus elementwise selects — for members of ``cid`` the
new nearest is ``min(d2, dnew)`` (their second-nearest is by
definition another medoid), for everyone else ``min(d1, dnew)``. The
reference's 'ambiguous subset' reassignment (kmedoids.py:637-670) and
its fixed-size bucket are needed only to REPAIR the cache on ACCEPTED
proposals: the points whose new second-nearest cannot be derived from
the cached pair (``a1==cid`` or ``a2==cid``, with ``dnew > d2``) are
gathered into a ``M = bucket_factor * n/k``-slot bucket and re-ranked
against all k medoids. When the true repair count fits the bucket
(tracked in ``overflow``), the update is exactly PAM; overflow cases
fall back to keeping the proposal rejected for safety. Since PAM
acceptance decays across sweeps, the amortized per-proposal cost
approaches the distance pass alone.

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

    n_valid = jnp.sum(valid)

    def cost(d):
        return jnp.sum(jnp.where(valid, d * d, 0.0)) / n_valid

    # ---- build the exact second-nearest cache (d2, a2) from the
    # warm-start (d1, a1): chunked (n, C) pairwise blocks through the
    # fused matrix kernel (k/C launches instead of k), running min
    # over all medoids other than each point's own.
    C_CHUNK = int(min(64, k))
    n_chunks = (k + C_CHUNK - 1) // C_CHUNK
    pad_k = n_chunks * C_CHUNK - k
    minds_pad = jnp.pad(medoid_inds, (0, pad_k))

    def init_chunk(ci, st):
        d2x, a2x = st
        idx = jax.lax.dynamic_slice_in_dim(minds_pad, ci * C_CHUNK,
                                           C_CHUNK)
        D = engine._pairwise_block(data, data[idx], metric)  # (n, C)
        cids = ci * C_CHUNK + jnp.arange(C_CHUNK, dtype=jnp.int32)
        invalid_col = (cids[None, :] == a1[:, None]) \
            | (cids[None, :] >= k)
        D = jnp.where(invalid_col, jnp.inf, D)
        carg = jnp.argmin(D, axis=1)
        cmin = jnp.min(D, axis=1)
        better = (cmin < d2x) & valid
        return (jnp.where(better, cmin, d2x),
                jnp.where(better, cids[carg], a2x))

    d2, a2 = jax.lax.fori_loop(
        0, n_chunks, init_chunk,
        (jnp.full(n, jnp.inf, jnp.float32),
         jnp.full(n, -1, jnp.int32)))

    def one_proposal(cid, state):
        d1, a1, d2, a2, medoid_inds, rbits, cost_cur = state

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

        dnew = dist_fn(data, p_idx)

        # post-swap nearest distance straight from the cache: members'
        # second-nearest is by definition a different medoid
        cand_d1 = jnp.where(members, jnp.minimum(d2, dnew),
                            jnp.minimum(d1, dnew))
        new_cost = cost(cand_d1)

        # cache-repair set: the swap displaced one of the point's two
        # cached medoids AND the candidate doesn't slot in below d2,
        # so the new second-nearest needs a full k-way re-rank
        uncertain = (((a1 == cid) | (a2 == cid)) & (dnew > d2)
                     & valid)
        overflow = jnp.sum(uncertain) > bucket

        accept = (new_cost < cost_cur) & (count > 0) & ~overflow

        def do_accept(op):
            d1, a1, d2, a2, medoid_inds = op
            in1 = dnew < d1
            in2 = dnew < d2
            caseB = a1 == cid            # nearest displaced
            caseC = a2 == cid            # second-nearest displaced
            # case A (neither displaced): insert dnew into (d1, d2)
            A_d1 = jnp.where(in1, dnew, d1)
            A_a1 = jnp.where(in1, cid, a1)
            A_d2 = jnp.where(in1, d1, jnp.where(in2, dnew, d2))
            A_a2 = jnp.where(in1, a1, jnp.where(in2, cid, a2))
            # case B: survivor pair = (d2, a2); insert dnew. Exact
            # when dnew <= d2; dnew > d2 is in the repair bucket.
            B_d1 = jnp.minimum(dnew, d2)
            B_a1 = jnp.where(in2, cid, a2)
            B_d2 = jnp.maximum(dnew, d2)
            B_a2 = jnp.where(in2, a2, cid)
            # case C: survivor pair = (d1, a1); insert dnew. dnew <=
            # d2 <= (true third) makes the pair exact; else bucket.
            C_d1 = jnp.minimum(dnew, d1)
            C_a1 = jnp.where(in1, cid, a1)
            C_d2 = jnp.maximum(dnew, d1)
            C_a2 = jnp.where(in1, a1, cid)

            nd1 = jnp.where(caseB, B_d1, jnp.where(caseC, C_d1, A_d1))
            na1 = jnp.where(caseB, B_a1, jnp.where(caseC, C_a1, A_a1))
            nd2 = jnp.where(caseB, B_d2, jnp.where(caseC, C_d2, A_d2))
            na2 = jnp.where(caseB, B_a2, jnp.where(caseC, C_a2, A_a2))
            nd1 = jnp.where(valid, nd1, jnp.inf)
            na1 = jnp.where(valid, na1, -1)
            nd2 = jnp.where(valid, nd2, jnp.inf)
            na2 = jnp.where(valid, na2, -1)

            # repair bucket: top_k on the mask is ~3x faster than
            # jnp.nonzero(size=...) on TPU (no cumsum); tie-break is
            # the lowest index, unused slots filtered by amb_real
            amb_idx = jax.lax.top_k(uncertain.astype(jnp.float32),
                                    bucket)[1].astype(jnp.int32)
            amb_real = uncertain[amb_idx]
            sub = data[amb_idx]                          # (bucket, ..)
            medoids = data[medoid_inds].at[cid].set(data[p_idx])
            d_amb = engine._pairwise_block(sub, medoids, metric)
            b_a1 = jnp.argmin(d_amb, axis=1).astype(jnp.int32)
            b_d1 = jnp.min(d_amb, axis=1)
            hide = (jnp.arange(k)[None, :] == b_a1[:, None])
            d_amb2 = jnp.where(hide, jnp.inf, d_amb)
            b_a2 = jnp.argmin(d_amb2, axis=1).astype(jnp.int32)
            b_d2 = jnp.min(d_amb2, axis=1)

            nd1 = nd1.at[amb_idx].set(
                jnp.where(amb_real, b_d1, nd1[amb_idx]))
            na1 = na1.at[amb_idx].set(
                jnp.where(amb_real, b_a1, na1[amb_idx]))
            nd2 = nd2.at[amb_idx].set(
                jnp.where(amb_real, b_d2, nd2[amb_idx]))
            na2 = na2.at[amb_idx].set(
                jnp.where(amb_real, b_a2, na2[amb_idx]))

            medoid_inds = medoid_inds.at[cid].set(p_idx)
            return (nd1, na1, nd2, na2, medoid_inds)

        d1, a1, d2, a2, medoid_inds = jax.lax.cond(
            accept, do_accept, lambda op: op,
            (d1, a1, d2, a2, medoid_inds))
        cost_cur = jnp.where(accept, new_cost, cost_cur)
        return (d1, a1, d2, a2, medoid_inds, rbits, cost_cur)

    def one_sweep(s, state):
        d1, a1, d2, a2, medoid_inds, cost_cur = state
        rbits = jax.random.bits(jax.random.fold_in(key, s), (n,),
                                jnp.uint32)
        d1, a1, d2, a2, medoid_inds, _, cost_cur = jax.lax.fori_loop(
            0, k, one_proposal,
            (d1, a1, d2, a2, medoid_inds, rbits, cost_cur))
        return (d1, a1, d2, a2, medoid_inds, cost_cur)

    d1, a1, d2, a2, medoid_inds, _ = jax.lax.fori_loop(
        0, n_sweeps, one_sweep,
        (d1, a1, d2, a2, medoid_inds, cost(d1)))
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
