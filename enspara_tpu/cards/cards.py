"""CARDS: Correlation of All Rotameric and Dynamical States.
(reference: enspara/cards/cards.py)

Pipeline: rotamer featurization (device associative-scan hysteresis) ->
order/disorder segmentation -> four MI matrices (ss, dd, sd, ds) via
the one-hot-matmul joint-count kernel.
"""

import logging

import numpy as np

from ..citation import cite
from ..info_theory import mutual_info
from . import disorder
from .featurizers import RotamerFeaturizer

logger = logging.getLogger(__name__)

__all__ = ['cards', 'cards_matrices']


@cite('cards')
def cards(trajectories, buffer_width=15, n_procs=1, mesh=None):
    """Structural, disorder, and cross MI matrices for all dihedral
    pairs across a set of trajectories. Returns
    ``(structural_mi, disorder_mi, struct_to_disorder_mi,
    disorder_to_struct_mi, atom_inds)``. With ``mesh``, the MI joint
    counting shards the frame axis across the device mesh.
    (reference: cards.py:17)"""
    featurizer = RotamerFeaturizer(
        buffer_width=buffer_width, n_procs=n_procs).fit(trajectories)
    mats = cards_matrices(featurizer.feature_trajectories_,
                          featurizer.n_feature_states_,
                          n_procs, mesh=mesh)
    return mats + (featurizer.atom_indices_,)


def _paint_labels_device(n_frames, n_features, starts, ends, feats):
    """Device variant of ``disorder._paint_labels``: the marked-segment
    boundary deltas (a few MB of indices) are scattered into an int8
    grid on device and cumsum'd there — the (T, F) label array is never
    materialized or uploaded from the host. Integer ops throughout, so
    it is bit-identical to the host painter."""
    import jax.numpy as jnp

    idx = jnp.asarray(np.concatenate([starts, ends]))
    fidx = jnp.asarray(np.concatenate([feats, feats]))
    sgn = jnp.asarray(np.concatenate(
        [np.ones(len(starts), np.int8), -np.ones(len(ends), np.int8)]))
    delta = jnp.zeros((n_frames + 1, n_features), jnp.int8)
    delta = delta.at[idx, fidx].add(sgn)
    return jnp.cumsum(delta[:-1], axis=0).astype(jnp.int8)


@cite('cards')
def cards_matrices(feature_trajs, n_feature_states, n_procs=None,
                   mesh=None):
    """The four CARDS MI matrices from rotamer state trajectories.
    With ``mesh`` (1-D ``jax.sharding.Mesh``), each joint-count matmul
    contracts over a frame-sharded axis (per-chip partials + one psum);
    trajectories then stay host-side and stream shard-placed per chunk
    instead of being staged whole on one device.
    (reference: cards.py:61)"""
    try:
        import jax.numpy as jnp
        have_jax = True
    except ImportError:
        have_jax = False

    if not have_jax or mesh is not None:
        # mesh path: labels stay host-side so joint counting can place
        # each chunk with frame-axis sharding (a device-painted array
        # would round-trip host<->device per chunk)
        disordered_trajs, disorder_n_states = \
            disorder.assign_order_disorder(feature_trajs)
        feature_trajs = [np.asarray(t) for t in feature_trajs]
    else:
        # disorder labels are derived ON DEVICE from the marked
        # segments (host float64 likelihood scoring, bit-identical to
        # assign_order_disorder) — the (T, F) label arrays are neither
        # painted on the host nor uploaded
        feature_trajs = [np.asarray(t) for t in feature_trajs]
        n_features = feature_trajs[0].shape[1]
        transition_times, mean_ord, mean_disord = \
            disorder.transition_stats(feature_trajs)
        disordered_trajs = [
            _paint_labels_device(
                trj.shape[0], n_features,
                *disorder._marked_segments(transition_times[i],
                                           mean_ord, mean_disord))
            for i, trj in enumerate(feature_trajs)]
        disorder_n_states = 2 * np.ones(n_features, dtype='int16')

        def _stage(t):
            # ship the array in its native integer width (int16 rotamer
            # states upload at half the bytes of an int32 copy, and the
            # host-side dtype conversion pass is skipped entirely)
            t = np.asarray(t)
            if not np.issubdtype(t.dtype, np.integer):
                t = t.astype(np.int32)
            return jnp.asarray(t)

        # stage the rotamer featurization onto the device ONCE — the
        # four MI matrices below reuse it (re-pushing per matrix costs
        # 4x the host->device traffic)
        feature_trajs = [_stage(t) for t in feature_trajs]

    # the four MI channels: (row source, column source), where 's' is
    # the rotamer-state featurization and 'd' the disorder labels
    channel = {'s': (feature_trajs, n_feature_states),
               'd': (disordered_trajs, disorder_n_states)}
    mats = []
    for row_key, col_key in (('s', 's'), ('d', 'd'),
                             ('s', 'd'), ('d', 's')):
        logger.debug('Calculating %s->%s mutual information',
                     row_key, col_key)
        rows, n_rows = channel[row_key]
        cols, n_cols = channel[col_key]
        mats.append(mutual_info.mi_matrix(
            rows, cols, n_rows, n_cols, mesh=mesh))
    return tuple(mats)
