"""K-medoids (PAM) clustering. (reference: enspara/cluster/kmedoids.py)

Orchestration stays on the host (the PAM sweep is inherently sequential:
each accepted proposal changes the state the next proposal is judged
against, kmedoids.py:520-700), but every heavy step — the full-dataset
distance to a proposed medoid and the nearest-medoid reassignment of
ambiguous frames — executes on the device mesh through the metric
kernels. This preserves the reference's exact update semantics (the
3-case mask logic) at the reference's O(k*n) per-sweep complexity.
"""

import logging

import numpy as np
from sklearn.utils import check_random_state

from ..exception import ImproperlyConfigured, DataInvalid
from . import util
from .util import run_timed


def _tpu_present():
    try:
        import jax
        return jax.default_backend() == 'tpu'
    except Exception:
        return False

logger = logging.getLogger(__name__)

__all__ = ['KMedoids', 'kmedoids', 'ctr_ids_mpi']


def ctr_ids_mpi(cluster_center_inds, lengths):
    """Map center indices to the reference's MPI-compatible
    ``(owner_rank, local_index)`` format (reference:
    cluster/kmedoids.py:365), with trajectories striped over processes
    round-robin. With one process (the usual single-controller case)
    every center is owned by rank 0 and the local index equals the
    concatenated global index.
    """
    from .. import ra as ra_mod
    from ..parallel.ops import _proc_info

    _, size = _proc_info()
    lengths = np.asarray(lengths)
    global_inds = ra_mod.RaggedArray(
        np.arange(int(lengths.sum())), lengths=lengths)

    out = []
    stripe_cache = {}   # at most `size` distinct stripes; O(n) once each
    for ind in cluster_center_inds:
        if hasattr(ind, '__len__'):
            traj_id, frame_id = int(ind[0]), int(ind[1])
        else:
            traj_id, frame_id = ra_mod.where(
                global_inds == int(ind))
            traj_id, frame_id = int(traj_id[0]), int(frame_id[0])
        rank = traj_id % size
        if rank not in stripe_cache:
            stripe_cache[rank] = np.concatenate(
                [np.asarray(r).reshape(-1)
                 for r in global_inds[rank::size]])
        local_concat = stripe_cache[rank]
        target = np.asarray(
            global_inds[traj_id, frame_id]).reshape(-1)[0]
        local_fid = int(np.flatnonzero(local_concat == target)[0])
        out.append((rank, local_fid))
    return out


class KMedoids(util.MolecularClusterMixin):
    """Sklearn-style estimator for k-medoids clustering.

    Parameters
    ----------
    metric : str or callable
    n_clusters : int, optional (required unless warm-starting fit())
    n_iters : int, default=5
        Number of PAM sweeps.
    """

    def __init__(self, metric, n_clusters=None, n_iters=5,
                 random_state=None):
        self.metric = metric
        self.n_clusters = n_clusters
        self.n_iters = n_iters
        self.random_state = random_state

    def fit(self, X, assignments=None, distances=None,
            cluster_center_inds=None):
        conf = dict(distance_method=self.metric,
                    n_clusters=self.n_clusters, n_iters=self.n_iters,
                    random_state=self.random_state)
        self.result_, self.runtime_ = run_timed(
            kmedoids, X, assignments=assignments, distances=distances,
            cluster_center_inds=cluster_center_inds, **conf)
        return self


def kmedoids(X, distance_method, n_clusters=None, n_iters=5,
             assignments=None, distances=None, cluster_center_inds=None,
             proposals=None, random_state=None, mesh=None):
    """Functional k-medoids (reference: cluster/kmedoids.py:108).

    Cold start: picks ``n_clusters`` random frames as medoids. Warm
    start: pass ``assignments``+``distances`` (center indices are then
    recovered) and/or ``cluster_center_inds``.
    """
    if (cluster_center_inds is None and n_clusters is None
            and (assignments is None or distances is None)):
        raise ImproperlyConfigured(
            'Must provide n_clusters or cluster_center_inds or '
            '(assignments and distances) for KMedoids')

    metric = util._get_distance_method(distance_method)
    random_state = check_random_state(random_state)

    assignments, distances, cluster_center_inds = _inputs_tree(
        X, metric, n_clusters, assignments, distances,
        cluster_center_inds, random_state)

    # fp32 kernel self-distance noise scales with the data magnitude
    # (QCP: ~sqrt(G*eps32/n_atoms)); a fixed 1e-3 absolute gate
    # rejected valid warm starts on large-magnitude data (r5 review)
    gate = max(1e-3, 1e-5 * float(np.max(np.abs(np.asarray(
        distances)))) if np.asarray(distances).size else 1e-3)
    if not np.all(np.asarray(distances)[cluster_center_inds] < gate):
        raise DataInvalid(
            'Warm-start assignments/distances are inconsistent with '
            'centers drawn from X: the recovered center frames sit '
            '%g away from their own cluster centers. Pass '
            'cluster_center_inds explicitly if the centers are not '
            'frames of X.'
            % float(np.asarray(distances)[cluster_center_inds].max()))

    return _kmedoids_iterations(
        X, metric, n_iters, cluster_center_inds, assignments, distances,
        proposals=proposals, random_state=random_state, mesh=mesh)


def _assign_to_inds(X, metric, center_inds):
    """Assign every frame to the centers at ``center_inds`` — the
    batched device scan for named metrics (one call, one data pass —
    the host per-center-block loop cost minutes of init at 1M frames,
    r5 review), the reference-semantics host loop otherwise."""
    name = util._metric_name(metric)
    if name is not None:
        from . import engine
        xyz = X.xyz if hasattr(X, 'xyz') else np.asarray(X)
        return engine.assign_device(xyz, xyz[np.asarray(center_inds)],
                                    name)
    return util.assign_to_nearest_center(
        X, [X[i] for i in center_inds], metric)


def _inputs_tree(X, metric, n_clusters, assignments, distances,
                 cluster_center_inds, random_state):
    """Resolve the three warm-start combinations into a consistent
    (assignments, distances, center_inds) triple.
    (reference: kmedoids.py:285-378)"""
    if (cluster_center_inds is None and assignments is None
            and distances is None):
        cluster_center_inds = random_state.choice(
            len(X), size=n_clusters, replace=False)
        assignments, distances = _assign_to_inds(
            X, metric, cluster_center_inds)
    elif cluster_center_inds is None:
        cluster_center_inds = util.find_cluster_centers(
            assignments, distances)
    elif assignments is None or distances is None:
        assignments, distances = _assign_to_inds(
            X, metric, cluster_center_inds)
    return (np.asarray(assignments), np.asarray(distances),
            list(np.asarray(cluster_center_inds)))


def _kmedoids_iterations(X, metric, n_iters, cluster_center_inds,
                         assignments, distances, proposals=None,
                         random_state=None, backend='auto',
                         mesh=None):
    """(reference: kmedoids.py:410)

    ``backend='auto'`` runs the sweeps fully on device
    (engine_kmedoids.kmedoids_sweeps_device — one jit for ALL sweeps,
    no per-proposal dispatches) when a TPU is present, the metric is a
    named device metric, and no explicit proposals were given; the
    host path (bit-matched to the reference's PAM choreography) is
    used otherwise or with ``backend='host'``. The two paths draw
    proposals from different PRNGs, so they are statistically — not
    bitwise — equivalent.
    """
    if backend not in ('auto', 'host', 'device'):
        raise DataInvalid("backend must be 'auto', 'host' or "
                          "'device', got %r" % (backend,))
    metric_name = util._metric_name(metric)
    use_device = (backend == 'device'
                  or (backend == 'auto' and proposals is None
                      and metric_name is not None
                      and _tpu_present()))
    if use_device and metric_name is not None:
        from .engine_kmedoids import kmedoids_sweeps_device
        from sklearn.utils import check_random_state

        rs = check_random_state(random_state)
        # the device engine consumes coordinate arrays; Trajectory
        # objects (which have no __array__) must hand over .xyz here
        # the way the k-centers front door does
        X_dev = X.xyz if hasattr(X, 'xyz') else X
        m, d, a = kmedoids_sweeps_device(
            X_dev, metric_name, np.asarray(assignments),
            np.asarray(distances, dtype=np.float64),
            np.asarray(cluster_center_inds),
            n_sweeps=n_iters, seed=int(rs.randint(2 ** 31)),
            mesh=mesh)
        return util.ClusterResult(
            center_indices=list(m), assignments=a, distances=d,
            centers=util.gather_frames(X, m))

    # n_iters=0 returns the warm-start state, matching the device
    # path (r5 review: the host path returned None)
    result = util.ClusterResult(
        center_indices=cluster_center_inds,
        assignments=assignments,
        distances=distances,
        centers=util.gather_frames(X, cluster_center_inds))
    for i in range(n_iters):
        cluster_center_inds, distances, assignments, centers = \
            _kmedoids_pam_update(
                X, metric, cluster_center_inds, assignments, distances,
                proposals=proposals, random_state=random_state)
        logger.info('KMedoids update %s', i)
        result = util.ClusterResult(
            center_indices=cluster_center_inds,
            assignments=assignments,
            distances=distances,
            centers=centers)
    return result


def _msq(x):
    return float(np.mean(np.square(x)))


def _propose_new_center_amongst(X, state_inds, random_state):
    """(reference: kmedoids.py:482)"""
    proposed_center_ind = random_state.choice(state_inds)
    return X[proposed_center_ind], proposed_center_ind


def _kmedoids_pam_update(X, metric, medoid_inds, assignments, distances,
                         proposals=None, cost=_msq, random_state=None):
    """One PAM sweep: for every medoid, propose a random member of its
    cluster as the replacement, recompute costs with the 3-case update,
    accept if the mean-square cost drops. (reference: kmedoids.py:520)
    """
    assignments = np.asarray(assignments)
    distances = np.asarray(distances, dtype=np.float64)
    assert np.issubdtype(assignments.dtype, np.integer)
    assert len(assignments) == len(X)
    assert len(distances) == len(X)

    random_state = check_random_state(random_state)

    if proposals is not None:
        if len(proposals) != len(medoid_inds):
            raise DataInvalid(
                "Length of 'proposals' didn't match length of "
                "'medoid_inds' ({} != {}).".format(
                    len(proposals), len(medoid_inds)))

    medoid_inds = list(medoid_inds)
    medoid_coords = [X[i] for i in medoid_inds]

    acceptances = 0
    old_cost = new_cost = cost(distances)
    for cid in range(len(medoid_inds)):
        state_inds = np.where(assignments == cid)[0]
        if len(state_inds) == 0:
            continue

        if proposals is None:
            proposed_center, proposed_center_ind = \
                _propose_new_center_amongst(X, state_inds, random_state)
        else:
            proposed_center_ind = proposals[cid]
            proposed_center = X[proposed_center_ind]

        new_ctr_dist = np.asarray(
            metric(X, proposed_center)).reshape(-1)

        new_dist = np.full_like(distances, -1.0)
        new_assig = np.full_like(assignments, -1)

        # case 1: the proposal is closer than the current medoid
        # (whichever cluster the frame is in) -> reassign to cid
        dst_dn = distances > new_ctr_dist
        new_assig[dst_dn] = cid
        new_dist[dst_dn] = new_ctr_dist[dst_dn]

        # case 2: farther, and assigned elsewhere -> unchanged
        dst_up_other = (distances <= new_ctr_dist) & (assignments != cid)
        new_assig[dst_up_other] = assignments[dst_up_other]
        new_dist[dst_up_other] = distances[dst_up_other]

        # case 3: farther, but the frame was assigned to cid -> must be
        # re-assigned against ALL medoids (with cid replaced). For the
        # named metrics this is ONE batched device call over the
        # ambiguous subset (the reference loops all k medoids on the
        # host, kmedoids.py:666)
        dst_up_this = (distances <= new_ctr_dist) & (assignments == cid)
        new_medoids = medoid_coords.copy()
        new_medoids[cid] = proposed_center
        metric_name = util._metric_name(metric)
        if metric_name is not None and np.count_nonzero(dst_up_this):
            from . import engine
            subset = X[dst_up_this]
            subset = subset.xyz if hasattr(subset, 'xyz') else \
                np.asarray(subset)
            ambig_assigs, ambig_dists = engine.assign_device(
                subset,
                np.stack([np.asarray(m.xyz[0])
                          if hasattr(m, 'xyz') else np.asarray(m)
                          for m in new_medoids]),
                metric_name)
        else:
            ambig_assigs, ambig_dists = util.assign_to_nearest_center(
                X[dst_up_this], new_medoids, metric)
        new_assig[dst_up_this] = ambig_assigs
        new_dist[dst_up_this] = ambig_dists

        assert np.all(new_assig >= 0)
        assert np.all(new_dist >= 0)

        old_cost = cost(distances)
        new_cost = cost(new_dist)

        if new_cost < old_cost:
            distances, assignments = new_dist, new_assig
            medoid_coords = new_medoids
            medoid_inds[cid] = proposed_center_ind
            acceptances += 1

    logger.info('Kmedoid sweep reduced cost to %.7f (%.2f%% acceptance)',
                min(old_cost, new_cost),
                acceptances / max(len(medoid_inds), 1) * 100)
    return medoid_inds, distances, assignments, medoid_coords
