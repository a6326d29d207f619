"""Checkpoint/resume for long-running clustering loops.

The reference scatters restart support across app flags
(--init-center-inds/--init-assignments/--init-distances,
apps/cluster.py:137-147) and per-sweep dumps (hybrid.py:129-151).
This unifies them into one checkpoint layer (SURVEY.md §5): the full
clustering state (distances, assignments, center indices, iteration,
algorithm metadata) round-trips through a single directory, and the
cluster estimators can warm-start from it.
"""

import json
import os

import numpy as np

__all__ = ['save_clustering_checkpoint', 'load_clustering_checkpoint',
           'resume_kcenters']


def save_clustering_checkpoint(path, distances, assignments,
                               center_indices, iteration=None,
                               metadata=None):
    """Write clustering state to a checkpoint directory."""
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, 'distances.npy'),
            np.asarray(distances))
    np.save(os.path.join(path, 'assignments.npy'),
            np.asarray(assignments))
    np.save(os.path.join(path, 'center_indices.npy'),
            np.asarray(center_indices))
    manifest = {
        'iteration': int(iteration) if iteration is not None
        else int(len(center_indices)),
        'n_frames': int(len(distances)),
        'metadata': metadata or {},
        'files': {
            'distances': 'distances.npy',
            'assignments': 'assignments.npy',
            'center_indices': 'center_indices.npy',
        },
    }
    with open(os.path.join(path, 'manifest.json'), 'w') as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return path


def load_clustering_checkpoint(path):
    """Read clustering state back: dict with distances, assignments,
    center_indices, iteration, metadata."""
    with open(os.path.join(path, 'manifest.json')) as f:
        manifest = json.load(f)
    files = manifest['files']
    return {
        'distances': np.load(os.path.join(path, files['distances'])),
        'assignments': np.load(os.path.join(path,
                                            files['assignments'])),
        'center_indices': np.load(
            os.path.join(path, files['center_indices'])),
        'iteration': manifest['iteration'],
        'metadata': manifest.get('metadata', {}),
    }


def resume_kcenters(path, X, metric='euclidean', n_clusters=None,
                    dist_cutoff=None, mesh=None):
    """Continue a checkpointed k-centers run to the new stopping
    criteria; returns a ClusterResult."""
    from ..cluster import engine
    from ..cluster.util import ClusterResult

    state = load_clustering_checkpoint(path)
    res = engine.kcenters_device(
        X, metric=metric, n_clusters=n_clusters,
        dist_cutoff=dist_cutoff,
        init_distances=state['distances'],
        init_assignments=state['assignments'],
        n_init_centers=state['iteration'],
        init_center_indices=state['center_indices'],
        mesh=mesh)
    from ..cluster.util import gather_frames
    ctr_inds = list(res.center_indices)
    centers = gather_frames(X, ctr_inds)
    return ClusterResult(center_indices=ctr_inds,
                         assignments=res.assignments,
                         distances=res.distances,
                         centers=centers)
