"""Mutual-information machinery: MI matrices, weighted MI, NMI/APC
normalizations, network deconvolution.
(reference: enspara/info_theory/mutual_info.py)

``mutual_information`` is fully vectorized (the reference iterates a
4-deep Python loop, mutual_info.py:272-326); ``weighted_mi`` computes
the joint distributions with one one-hot matmul on device.
"""

import itertools
import logging
import numbers
import warnings

import numpy as np

from .. import exception
from . import libinfo

logger = logging.getLogger(__name__)

__all__ = ['mi_matrix', 'weighted_mi', 'mi_matrix_serial', 'joint_counts',
           'mutual_information', 'mi_to_nmi_apc', 'deconvolute_network',
           'mi_to_nmi', 'mi_to_apc', 'channel_capacity_normalization',
           'check_features_states']


def mi_matrix(Xs, Ys, n_x, n_y, normalize=True, mesh=None):
    """All-pairs MI across trajectories of assigned (discretized)
    features. With ``mesh``, joint counting shards the frame axis
    across the device mesh (see ``libinfo.matrix_bincount2d``).
    (reference: mutual_info.py:23)"""
    jc = None
    for i, (X, Y) in enumerate(zip(Xs, Ys)):
        # device arrays pass through untouched (joint_counts consumes
        # them in place; forcing np.asarray would pull them to host)
        jc_i = joint_counts(X, Y,
                            int(np.max(n_x)), int(np.max(n_y)),
                            mesh=mesh)
        if jc is None:
            jc = jc_i.astype(np.int64)
        else:
            if jc.shape != jc_i.shape:
                raise exception.DataInvalid(
                    'Trajectory %s gave a joint counts matrix of shape '
                    '%s where %s was expected. Are you sure all your '
                    'trajectories have the same number of features?'
                    % (i, jc_i.shape, jc.shape))
            jc += jc_i

    mi = mutual_information(jc)
    if normalize:
        mi = channel_capacity_normalization(mi, n_x, n_y)
    return mi


def joint_counts(X, Y=None, n_x=None, n_y=None, mesh=None):
    """Joint counts of all feature pairs: (Fa, Fb, n_x, n_y).
    (reference: mutual_info.py:212)"""
    if not hasattr(X, 'shape'):
        X = np.asarray(X)
    if Y is not None and not hasattr(Y, 'shape'):
        Y = np.asarray(Y)
    if len(X.shape) == 1:
        X = X[..., None]
    if Y is not None and len(Y.shape) == 1:
        Y = Y[..., None]

    if n_x is None:
        n_x = int(X.max()) + 1

    if Y is None:
        if n_y is not None:
            warnings.warn('n_y unused if Y is None.')
        return libinfo.matrix_bincount2d(X, X, n_x, n_x, mesh=mesh)

    if n_y is None:
        n_y = int(Y.max()) + 1
    return libinfo.matrix_bincount2d(X, Y, n_x, n_y, mesh=mesh)


def mutual_information(jc):
    """MI of a 4-D array of joint count matrices -> (Fa, Fb).
    (reference: mutual_info.py:272, devectorized there; vectorized
    here)"""
    jc = _validate_joint_counts_matrix(jc).astype(np.float64)

    n_obs_a = jc.sum(axis=-1)             # (Fa, Fb, n_x)
    n_obs_b = jc.sum(axis=-2)             # (Fa, Fb, n_y)
    n_obs = n_obs_a.sum(axis=-1)          # (Fa, Fb)

    denom = np.where(n_obs > 0, n_obs, 1.0)
    P_a = n_obs_a / denom[..., None]
    P_b = n_obs_b / denom[..., None]
    P_ab = jc / denom[..., None, None]

    prod = P_a[..., :, None] * P_b[..., None, :]
    valid = (P_ab > 0) & (prod > 0)
    ratio = np.divide(P_ab, prod, where=valid,
                      out=np.ones_like(P_ab))
    terms = P_ab * np.log(ratio, where=valid, out=np.zeros_like(P_ab))
    return np.where(valid, terms, 0.0).sum(axis=(-1, -2))


def mi_matrix_serial(states_a_list, states_b_list, n_a_states,
                     n_b_states, normalize=True):
    """Feature-pair-at-a-time MI (testing reference implementation).
    (reference: mutual_info.py:186)"""
    n_traj = len(states_a_list)
    n_features = states_a_list[0].shape[1]
    mi = np.zeros((n_features, n_features))

    for i in range(n_features):
        for j in range(i, n_features):
            jc = libinfo.bincount2d(
                states_a_list[0][:, i], states_b_list[0][:, j],
                n_a_states[i], n_b_states[j]).astype(np.int64)
            for k in range(1, n_traj):
                jc += libinfo.bincount2d(
                    states_a_list[k][:, i], states_b_list[k][:, j],
                    n_a_states[i], n_b_states[j])
            mi[i, j] = mutual_information(jc[None, None])[0, 0]
            mi[j, i] = mi[i, j]

    if normalize:
        mi = channel_capacity_normalization(mi, n_a_states, n_b_states)
    return mi


def weighted_mi(features, weights, n_feature_states=None, normalize=True):
    """MI matrix of weighted observations via weighted one-hot matmuls
    (P_joint = (onehot(X) * w).T @ onehot(X)).
    (reference: mutual_info.py:78; matmul form :149-153)"""
    features = np.asarray(features)
    weights = np.array(weights, dtype=np.float64, copy=True)

    assert features.ndim == 2
    assert weights.ndim == 1
    assert np.all(weights >= 0)

    if weights.shape[0] != features.shape[0]:
        raise exception.DataInvalid(
            "The number of features (%s in array with shape %s) didn't "
            'match the number of weights (%s)'
            % (features.shape[0], features.shape, weights.shape[0]))

    if weights.sum() != 1:
        weights = weights / np.linalg.norm(weights, ord=1)

    if n_feature_states is None:
        n_feature_states = np.full(features.shape[1],
                                   features.max() + 1, dtype='int16')
    else:
        n_feature_states = np.array(n_feature_states)

    if n_feature_states.shape[0] != features.shape[1]:
        raise exception.DataInvalid(
            'The length of feature states number vector (%s) must equal '
            'the number of features given (%s)'
            % (n_feature_states.shape[0], features.shape[1]))

    n_feat = features.shape[1]
    s_max = int(max(n_feature_states))

    try:
        import jax
        import jax.numpy as jnp
        F = jax.nn.one_hot(features, s_max, dtype=jnp.float32)
        F2 = F.reshape(features.shape[0], n_feat * s_max)
        W2 = F2 * jnp.asarray(weights, jnp.float32)[:, None]
        PJ = jnp.dot(W2.T, F2, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        P_joint = np.asarray(PJ, dtype=np.float64).reshape(
            n_feat, s_max, n_feat, s_max).transpose(1, 3, 0, 2)
    except Exception:
        onehot = np.stack([features == u for u in range(s_max)], axis=-1)
        P_joint = np.einsum('tiu,t,tjv->uvij', onehot, weights, onehot)

    P_marg = np.vstack([
        np.bincount(features[:, i], weights=weights, minlength=s_max)
        for i in range(n_feat)])   # (n_feat, s_max)

    P_prod = (P_marg.T[:, None, :, None]       # u, -, i, -
              * P_marg.T[None, :, None, :])    # -, v, -, j

    mi_mats = np.zeros_like(P_joint)
    np.divide(P_joint, P_prod, where=(P_prod != 0), out=mi_mats)
    np.log(mi_mats, where=mi_mats != 0, out=mi_mats)
    np.multiply(P_joint, mi_mats, out=mi_mats)

    assert not np.any(np.isnan(mi_mats))
    mi_mtx = mi_mats.sum(axis=(0, 1))
    assert not np.any(np.isinf(mi_mtx))

    if normalize:
        mi_mtx = channel_capacity_normalization(
            mi_mtx, n_feature_states, n_feature_states)
    np.clip(mi_mtx, a_min=0, a_max=np.inf, out=mi_mtx)
    return mi_mtx


def mi_to_nmi_apc(mutual_information, H_marginal=None):
    """NMI-APC (Lopez et al.): (MI - APC) / H_joint.
    (reference: mutual_info.py:330)"""
    _validate_mutual_information_matrix(mutual_information)

    apc_arr = mi_to_apc(mutual_information)
    nmi = mi_to_nmi(mutual_information, H_marginal)

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        H_joint = (nmi ** -1) * mutual_information

    nmi_apc_arr = mutual_information - apc_arr
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        nmi_apc_arr = nmi_apc_arr / H_joint

    nmi_apc_arr[np.isnan(nmi_apc_arr)] = 0
    return nmi_apc_arr


def deconvolute_network(G_obs):
    """Network deconvolution (Feizi et al. 2013): eigenvalue transform
    v -> v/(1+v). (reference: mutual_info.py:405)"""
    from numpy.linalg import eig, inv
    v, w = eig(G_obs)
    v_dir = v / (1 + v)
    sig_dir = np.diagflat(v_dir)
    return np.matmul(np.matmul(w, sig_dir), inv(w))


def mi_to_nmi(mutual_information, H_marginal=None):
    """NMI(i,j) = MI(i,j)/H_joint(i,j). (reference: mutual_info.py:442)"""
    _validate_mutual_information_matrix(mutual_information)

    if H_marginal is None:
        H_marginal = np.diag(mutual_information)
    if np.any(H_marginal == 0):
        warnings.warn('H_marginal contains zero entries. This may lead '
                      'to negative information.')
    if len(H_marginal) != len(mutual_information):
        raise exception.DataInvalid(
            'H_marginal must be the same length as the mutual '
            'information matrix. Got %s and %s.'
            % (len(H_marginal), len(mutual_information)))
    if np.all(H_marginal == 0) or np.any(np.isnan(H_marginal)):
        raise exception.DataInvalid(
            'The mutual information matrix must have non-zero entries '
            'and cannot contain any nan values.')

    mutual_information = mutual_information.copy()
    mutual_information[np.diag_indices_from(mutual_information)] = \
        H_marginal

    H_joint = (H_marginal[:, None] + H_marginal[None, :]
               - mutual_information)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        nmi = mutual_information / H_joint

    np.fill_diagonal(nmi, 1)
    nmi[np.isnan(nmi)] = 0
    return nmi


def mi_to_apc(mi_arr):
    """Average product correlation: (MI @ MI) / n^2.
    (reference: mutual_info.py:513)"""
    _validate_mutual_information_matrix(mi_arr)
    return np.matmul(mi_arr, mi_arr) / (len(mi_arr) * len(mi_arr))


def channel_capacity_normalization(mi, n_x, n_y):
    """Normalize by log(min(n_x_i, n_y_j)).
    (reference: mutual_info.py:551)"""
    mi = mi.copy()
    n_x = _validate_feature_states_array(n_x, mi.shape[0])
    n_y = _validate_feature_states_array(n_y, mi.shape[1])

    assert np.all(n_x >= 2)
    assert np.all(n_y >= 2)

    min_num_states = np.fmin(*np.meshgrid(n_x, n_y))
    np.divide(mi, np.log(min_num_states), out=mi)
    return mi


def check_features_states(states, n_states):
    """(reference: mutual_info.py:585)"""
    n_features = len(n_states)
    if len(states[0][0]) != n_features:
        raise exception.DataInvalid(
            "The number-of-states vector's length ({s}) didn't match "
            'the width of state assignments array with shape {a}.'
            .format(s=len(n_states), a=len(states[0][0])))
    if not all(len(t[0]) == len(states[0][0]) for t in states):
        raise exception.DataInvalid(
            'The number of features differs between trajectories. '
            'Numbers of features were: {l}.'
            .format(l=[len(t[0]) for t in states]))


def _validate_joint_counts_matrix(jc):
    jc = np.asarray(jc)
    if len(jc.shape) == 2:
        raise exception.DataInvalid(
            'Expected a 4D array of joint counts matrices, but got a 2D '
            'array. If your dataset is a single joint counts matrix, '
            'try `jc[None, None, ...]` to expand its dimensions.')
    if len(jc.shape) != 4:
        raise exception.DataInvalid(
            'Expected a 4D array of joint counts matrices, but an array '
            'with shape %s.' % (jc.shape,))
    return jc


def _validate_mutual_information_matrix(mi):
    if len(mi.shape) != 2:
        raise exception.DataInvalid(
            'MI arrays must be 2D. Got %s.' % len(mi.shape))
    if mi.shape[0] != mi.shape[1]:
        raise exception.DataInvalid(
            'Mutual information matrices must be square; got shape %s.'
            % (mi.shape,))
    if not np.allclose(mi.T, mi):
        raise exception.DataInvalid(
            'Mutual information matrices must be symmetric.')


def _validate_feature_states_array(n, mi_dim):
    if not hasattr(n, '__len__'):
        n = np.full(mi_dim, n, dtype='int')
    else:
        n = np.array(n)

    if np.any(n < 2):
        raise exception.DataInvalid(
            'Cannot normalize channel capacity for n_states < 1, got: %s'
            % n)
    if len(n) != mi_dim:
        raise exception.DataInvalid(
            'Feature states array must match mi array dim 0 '
            '(got %s and %s)' % (len(n), mi_dim))
    if not issubclass(n.dtype.type, numbers.Integral):
        raise exception.DataInvalid(
            'Feature states array must be integral (got %s).' % n.dtype)
    return n
