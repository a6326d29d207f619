"""Synthetic trajectories and ensemble evolution from a transition
matrix. (reference: enspara/msm/synthetic_data.py)

``synthetic_trajectory`` follows the reference host API;
``synthetic_trajectory_device`` is the TPU-native kinetic Monte Carlo:
a ``lax.scan`` over steps with categorical sampling per step, vmappable
over many chains — replacing the reference's per-step Python loop.
"""

import numpy as np
import scipy.sparse

__all__ = ['synthetic_trajectory', 'synthetic_ensemble',
           'synthetic_trajectory_device']


def synthetic_trajectory(T, start_state, n_steps, random_state=None):
    """Kinetic Monte Carlo chain of ``n_steps`` states (including the
    start state) from row-stochastic T. (reference:
    synthetic_data.py:15)"""
    traj = -1 * np.ones(n_steps, dtype=int)
    traj[0] = start_state
    states = T.shape[0]
    rng = np.random.default_rng(random_state)
    dense = not scipy.sparse.issparse(T)
    for i in range(n_steps - 1):
        p = T[traj[i], :] if dense else T.tocsr()[traj[i], :].toarray()[0]
        traj[i + 1] = rng.choice(states, p=np.asarray(p).ravel())
    return traj


def synthetic_trajectory_device(T, start_states, n_steps, key=None):
    """Vectorized kinetic Monte Carlo on device: simulate
    ``len(start_states)`` independent chains of ``n_steps`` states each.

    Parameters
    ----------
    T : (n_states, n_states) row-stochastic matrix (dense).
    start_states : (n_chains,) int array.
    key : jax PRNG key (default: PRNGKey(0)).

    Returns
    -------
    (n_chains, n_steps) int32 array of state sequences.
    """
    import jax
    import jax.numpy as jnp

    if key is None:
        key = jax.random.PRNGKey(0)
    T = jnp.asarray(T, jnp.float32)
    logT = jnp.log(jnp.maximum(T, 1e-30))
    start = jnp.asarray(start_states, jnp.int32)
    n_chains = start.shape[0]

    def step(carry, k):
        state = carry
        nxt = jax.random.categorical(k, logT[state], axis=-1)
        return nxt.astype(jnp.int32), state

    keys = jax.random.split(key, n_steps - 1)
    last, rest = jax.lax.scan(step, start, keys)
    chain = jnp.concatenate(
        [jnp.swapaxes(rest, 0, 1),
         last[:, None]], axis=1)
    return np.asarray(chain)


def synthetic_ensemble(T, init_pops, n_steps, observable_per_state=None):
    """Evolve populations p <- p T for n_steps; optionally project onto
    a per-state observable. (reference: synthetic_data.py:49)"""
    if scipy.sparse.issparse(T):
        T_op = scipy.sparse.linalg.aslinearoperator(T.tocsr())
    else:
        T_op = scipy.sparse.linalg.aslinearoperator(np.asarray(T))

    p = np.asarray(init_pops, dtype=float).copy()
    if observable_per_state is not None:
        observations = [p.dot(observable_per_state)]
        for _ in range(n_steps - 1):
            p = T_op.rmatvec(p)
            observations.append(p.dot(observable_per_state))
    else:
        observations = [p]
        for _ in range(n_steps - 1):
            p = T_op.rmatvec(p)
            observations.append(p)

    return p, np.array(observations)
