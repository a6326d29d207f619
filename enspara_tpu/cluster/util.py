"""Clustering utilities: results container, nearest-center assignment,
metric dispatch. (reference: enspara/cluster/util.py)
"""

import logging
from collections import namedtuple

import numpy as np

from .. import ra
from ..exception import ImproperlyConfigured, DataInvalid
from ..ra.ra import partition_list, partition_indices
from ..geometry import libdist

logger = logging.getLogger(__name__)

__all__ = ['ClusterResult', 'assign_to_nearest_center',
           'find_cluster_centers', 'MolecularClusterMixin']


class ClusterResult(namedtuple('ClusterResult',
                               ['center_indices', 'distances',
                                'assignments', 'centers'])):
    """Clustering output: per-frame assignments/distances, the indices
    of frames chosen as centers, and the center data itself.
    (reference: cluster/util.py:105)"""

    def partition(self, lengths):
        """Split concatenated per-frame arrays back into per-trajectory
        rows; ndarray when lengths are uniform, RaggedArray otherwise.
        (reference: cluster/util.py:111)"""
        square = all(lengths[0] == ln for ln in lengths)
        if square:
            return ClusterResult(
                assignments=np.array(
                    partition_list(self.assignments, lengths)),
                distances=np.array(
                    partition_list(self.distances, lengths)),
                center_indices=partition_indices(
                    self.center_indices, lengths),
                centers=self.centers)
        return ClusterResult(
            assignments=ra.RaggedArray(self.assignments, lengths=lengths),
            distances=ra.RaggedArray(self.distances, lengths=lengths),
            center_indices=partition_indices(
                self.center_indices, lengths),
            centers=self.centers)


def assign_to_nearest_center(trajectory, cluster_centers, distance_method):
    """Assign each frame to the nearest of ``cluster_centers`` under
    ``distance_method``, with the reference's semantics: iterate centers
    in order, strict-< updates (first-minimum tie-breaking).
    (reference: cluster/util.py:159)

    For the batched device form used in hot paths see
    :func:`enspara_tpu.cluster.engine.assign_device`.
    """
    assignments = np.zeros(len(trajectory), dtype=int)
    distances = np.full(len(trajectory), np.inf, dtype=float)

    for i, center in enumerate(cluster_centers):
        dist = np.asarray(distance_method(trajectory, center)).reshape(-1)
        inds = dist < distances
        distances[inds] = dist[inds]
        assignments[inds] = i
    return assignments, distances


def find_cluster_centers(assignments, distances):
    """For each label, the index of its minimum-distance frame.
    (reference: cluster/util.py:208)"""
    if len(distances) != len(assignments):
        raise DataInvalid(
            'Length of distances (%s) must match length of assignments '
            '(%s).' % (len(distances), len(assignments)))
    assignments = np.asarray(assignments)
    distances = np.asarray(distances)
    unique = np.unique(assignments)
    center_inds = np.zeros_like(unique)
    for i, c in enumerate(unique):
        frames = np.where(assignments == c)[0]
        center_inds[i] = frames[np.argmin(distances[frames])]
    return center_inds


def _rmsd_metric(trajectory, center):
    """Callable metric adapter for coordinate data: minimum RMSD of each
    frame to one structure, via the QCP device kernel."""
    from ..ops import qcp
    xyz = trajectory.xyz if hasattr(trajectory, 'xyz') else trajectory
    cxyz = center.xyz if hasattr(center, 'xyz') else center
    cxyz = np.asarray(cxyz)
    if cxyz.ndim == 3:
        cxyz = cxyz[0]
    return np.asarray(qcp.rmsd(np.asarray(xyz), cxyz), dtype=np.float64)


def _get_distance_method(metric):
    """'rmsd' -> QCP kernel; named vector metrics -> libdist; callables
    pass through. (reference: cluster/util.py:289)"""
    if metric == 'rmsd':
        return _rmsd_metric
    if metric == 'euclidean':
        return libdist.euclidean
    if metric in ('cityblock', 'manhattan'):
        return libdist.manhattan
    if metric == 'hamming':
        return libdist.hamming
    if callable(metric):
        return metric
    raise ImproperlyConfigured(
        "Unknown metric %r: expected 'rmsd', 'euclidean', 'manhattan', "
        "'hamming', or a callable." % (metric,))


def _metric_name(metric):
    """The device-engine name for a metric, or None if only the generic
    host path applies (user callables)."""
    if metric in ('rmsd', 'euclidean', 'manhattan', 'cityblock',
                  'hamming'):
        return 'manhattan' if metric == 'cityblock' else metric
    if metric is libdist.euclidean:
        return 'euclidean'
    if metric is libdist.manhattan:
        return 'manhattan'
    if metric is libdist.hamming:
        return 'hamming'
    if metric is _rmsd_metric:
        return 'rmsd'
    return None


class MolecularClusterMixin:
    """predict() + result_ properties shared by the cluster estimators.
    (reference: cluster/util.py:46)"""

    def predict(self, X):
        if not hasattr(self, 'result_'):
            raise ImproperlyConfigured(
                'To predict the clustering result for new data, the '
                'clusterer first must have fit some data.')
        pred_assigs, pred_dists = assign_to_nearest_center(
            X, self.centers_, _get_distance_method(self.metric))
        pred_centers = find_cluster_centers(pred_assigs, pred_dists)
        return ClusterResult(
            assignments=pred_assigs,
            distances=pred_dists,
            center_indices=pred_centers,
            centers=self.centers_)

    @property
    def labels_(self):
        return self.result_.assignments

    @property
    def distances_(self):
        return self.result_.distances

    @property
    def center_indices_(self):
        return self.result_.center_indices

    @property
    def centers_(self):
        return self.result_.centers
