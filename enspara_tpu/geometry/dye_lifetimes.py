"""Per-photon Monte Carlo of donor-dye relaxation over coupled
protein x dye MSMs. (reference: enspara/geometry/dye_lifetimes.py)

For each protein conformation, dye MSMs are rebuilt after removing
sterically clashed dye states; the donor excitation then random-walks
through (donor state, acceptor state) pairs, each step evaluating the
instantaneous FRET rate from kappa^2 and distance until it decays
radiatively, non-radiatively, or by energy transfer.
"""

import logging
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from scipy.optimize import curve_fit

from .. import exception, ra
from ..msm import builders, synthetic_data
from . import dyes_from_expt_dist as dyes_exp_dist
from . import explicit_r0_calc as r0c

logger = logging.getLogger(__name__)

__all__ = ['FRET_rate', 'calc_dye_radiative_rates',
           'calc_energy_transfer_prob', 'resolve_excitation',
           'resolve_excitations_device',
           'make_dye_msm', 'calc_lifetimes',
           'sample_lifetimes_guarenteed_photon',
           'remake_prot_MSM_from_lifetimes', 'run_mc',
           'calc_per_state_FE', 'fit_lifetimes_single_exp',
           'fit_lifetimes_double_exp',
           'extract_fret_efficiency_lifetimes']


def FRET_rate(r, R0, Td):
    """kRET = (1/Td) (R0/r)^6. (reference: dye_lifetimes.py:9)"""
    return (1 / Td) * ((R0 / r) ** 6)


def calc_dye_radiative_rates(Qd, Td):
    """(krad, k_non_radiative). (reference: dye_lifetimes.py:29)"""
    krad = Qd / Td
    k_non_rad = (1 / Td) - krad
    return krad, k_non_rad


def calc_energy_transfer_prob(krad, k_non_rad, kRET, dt):
    """[p_radiative, p_nonradiative, p_RET, p_remain_excited] over a
    timestep. (reference: dye_lifetimes.py:53)"""
    rates = np.concatenate([np.ravel(krad), np.ravel(k_non_rad),
                            np.ravel(kRET)]).astype(float)
    decayed = 1.0 - np.exp(-rates * dt)
    remain = 1.0 - decayed.sum()

    probs = np.append(decayed, max(remain, 0.0))
    if remain < 0:
        # timestep too coarse for these rates: renormalize the decay
        # channels instead of carrying a negative survival
        probs /= probs.sum()
    return probs


_OUTCOMES = np.array(['radiative', 'non_radiative', 'energy_transfer',
                      'excited'])


def _pair_k2_r(d_geom, a_geom):
    """(n_d, n_a) kappa^2 and inter-dye-distance tables from 9-column
    dye geometry rows (emission center, dipole origin, dipole vector)
    — the batched form of ``r0c.calc_k2_r`` over every state pair."""
    Dc, Ddo, Dv = d_geom[:, 0:3], d_geom[:, 3:6], d_geom[:, 6:9]
    Ac, Ado, Av = a_geom[:, 0:3], a_geom[:, 3:6], a_geom[:, 6:9]

    r = np.linalg.norm(Dc[:, None] - Ac[None], axis=-1)
    rvec = Ddo[:, None] - Ado[None]                  # (n_d, n_a, 3)
    nr = np.linalg.norm(rvec, axis=-1)
    nD = np.linalg.norm(Dv, axis=-1)
    nA = np.linalg.norm(Av, axis=-1)
    cos_T = (Av @ Dv.T).T / (nD[:, None] * nA[None])
    cos_D = np.einsum('dai,di->da', rvec, Dv) / (nr * nD[:, None])
    cos_A = np.einsum('dai,ai->da', rvec, Av) / (nr * nA[None])
    k2 = (cos_T - 3 * cos_D * cos_A) ** 2
    return k2, r


def explicit_static_dyes(d_name, a_name, d_eqs, a_eqs, d_centers,
                         a_centers, dye_params, dyelibrary,
                         n_samples=1000, rng_seed=None):
    """Static-dye treatment: equilibrium dye positions, single coin
    flip per sample — all FRET efficiencies come from one batched
    (n_d, n_a) kappa^2/distance table."""
    rng = np.random.default_rng(rng_seed)
    J, Qd, _Td = dye_params

    picks_d = rng.choice(len(d_eqs), p=d_eqs, size=n_samples)
    picks_a = rng.choice(len(a_eqs), p=a_eqs, size=n_samples)

    k2_tab, r_tab = _pair_k2_r(
        r0c.assemble_dye_r_mu(d_centers, d_name, dyelibrary),
        r0c.assemble_dye_r_mu(a_centers, a_name, dyelibrary))
    FE_tab = dyes_exp_dist.FRET_efficiency(
        r_tab, r0c.calc_R0(k2_tab, Qd, J))

    hops = rng.random(n_samples) <= FE_tab[picks_d, picks_a]
    return [[0, 'energy_transfer' if hop else 'radiative']
            for hop in hops]


def fully_averaged_explict_dyes(d_name, a_name, d_eqs, a_eqs, d_centers,
                                a_centers, dye_params, dyelibrary,
                                n_samples=1000, rng_seed=None):
    """Isotropic treatment, REFERENCE-FAITHFUL including its quirk:
    the reference's loop (dye_lifetimes.py:162) computes the
    population-weighted average efficiency but then flips every coin
    on the stale loop variable — i.e. the LAST (donor, acceptor)
    pair's efficiency. That exact convention is reproduced here so the
    live oracles agree; the weighted tables (FE_tab, pair_eqs) are
    returned for callers who want the average the name suggests."""
    rng = np.random.default_rng(rng_seed)
    J, Qd, _Td = dye_params

    live_d = np.flatnonzero(np.asarray(d_eqs))
    live_a = np.flatnonzero(np.asarray(a_eqs))

    k2_tab, r_tab = _pair_k2_r(
        r0c.assemble_dye_r_mu(d_centers, d_name, dyelibrary)[live_d],
        r0c.assemble_dye_r_mu(a_centers, a_name, dyelibrary)[live_a])
    FE_tab = dyes_exp_dist.FRET_efficiency(
        r_tab, r0c.calc_R0(k2_tab, Qd, J))
    pair_eqs = np.outer(np.take(d_eqs, live_d), np.take(a_eqs, live_a))

    # reference convention: the coin flip uses the LAST pair's
    # efficiency (dye_lifetimes.py:162 loop-carried FE), kept as-is
    hop_p = float(FE_tab[-1, -1]) if FE_tab.size else 0.0
    transfers = np.where(rng.random(n_samples) <= hop_p,
                         'energy_transfer', 'radiative').astype(object)
    return [[0] * n_samples, transfers, k2_tab.ravel(),
            FE_tab.ravel(), pair_eqs.ravel()]


def resolve_excitation(d_name, a_name, d_tprobs, a_tprobs, d_eqs, a_eqs,
                       d_centers, a_centers, dye_params, dye_lagtime,
                       dyelibrary, rng_seed=None):
    """Monte Carlo of one donor excitation event.
    (reference: dye_lifetimes.py:258)

    Returns ``[steps, outcome, donor_traj, acceptor_traj]``.
    """
    rng = np.random.default_rng(rng_seed)
    J, Qd, Td = dye_params
    krad, k_non_rad = calc_dye_radiative_rates(Qd, Td)

    d_geom = r0c.assemble_dye_r_mu(d_centers, d_name, dyelibrary)
    a_geom = r0c.assemble_dye_r_mu(a_centers, a_name, dyelibrary)

    d_path = [rng.choice(np.arange(d_tprobs.shape[0]), p=d_eqs)]
    a_path = [rng.choice(np.arange(a_tprobs.shape[0]), p=a_eqs)]

    fate = 'excited'
    while fate == 'excited':
        # decay channels from the CURRENT pair geometry...
        k2, r = r0c.calc_k2_r(d_geom[d_path[-1]], a_geom[a_path[-1]])
        kRET = FRET_rate(r, r0c.calc_R0(k2, Qd, J), Td)
        fate = rng.choice(_OUTCOMES, p=calc_energy_transfer_prob(
            krad, k_non_rad, kRET, dye_lagtime))
        # ...then both dye MSMs advance one lag step
        d_path.append(rng.choice(len(d_geom), p=d_tprobs[d_path[-1]]))
        a_path.append(rng.choice(len(a_geom), p=a_tprobs[a_path[-1]]))

    return [len(d_path) - 1, fate, np.array(d_path), np.array(a_path)]


def _pair_rate_tables(d_name, a_name, d_centers, a_centers, dye_params,
                      dye_lagtime, dyelibrary):
    """(n_d, n_a, 4) outcome-probability table for every (donor state,
    acceptor state) pair — the vectorized form of the per-step
    ``calc_k2_r`` -> ``calc_R0`` -> ``FRET_rate`` ->
    ``calc_energy_transfer_prob`` chain in :func:`resolve_excitation`.
    """
    J, Qd, Td = dye_params
    krad, k_non_rad = calc_dye_radiative_rates(Qd, Td)

    k2, r = _pair_k2_r(
        r0c.assemble_dye_r_mu(d_centers, d_name, dyelibrary),
        r0c.assemble_dye_r_mu(a_centers, a_name, dyelibrary))
    R0 = r0c.calc_R0(k2, Qd, J)
    kRET = FRET_rate(r, R0, Td)

    dt = dye_lagtime
    p_rad = 1 - np.exp(-krad * dt)
    p_nonrad = 1 - np.exp(-k_non_rad * dt)
    p_RET = 1 - np.exp(-kRET * dt)
    p_remain = 1 - p_rad - p_nonrad - p_RET
    probs = np.stack([np.broadcast_to(p_rad, r.shape),
                      np.broadcast_to(p_nonrad, r.shape),
                      p_RET, p_remain], axis=-1)
    # clamp the calc_energy_transfer_prob renormalization case
    neg = probs[..., 3] < 0
    probs[..., 3] = np.where(neg, 0.0, probs[..., 3])
    probs /= probs.sum(axis=-1, keepdims=True)
    return probs


def resolve_excitations_device(d_name, a_name, d_tprobs, a_tprobs,
                               d_eqs, a_eqs, d_centers, a_centers,
                               dye_params, dye_lagtime, dyelibrary=None,
                               n_samples=1000, rng_seed=0,
                               max_steps=None):
    """All-photon Monte Carlo on device: every excitation advances in
    lockstep through one ``lax.while_loop`` — per step a (n_d, n_a)
    table lookup of outcome probabilities plus categorical draws for
    the outcome and both dye-MSM moves. Replaces the reference's
    per-photon Python loop (dye_lifetimes.py:258) when thousands of
    photons are sampled; statistically identical but NOT bit-matched
    (jax PRNG vs numpy Generator).

    Returns ``(steps (n,), outcomes (n,) str)`` matching
    :func:`resolve_excitation` semantics (steps counts the emission
    step; outcome is the decay channel).
    """
    import jax
    import jax.numpy as jnp

    if dyelibrary is None:
        dyelibrary = r0c.load_library()
    J, Qd, Td = dye_params
    if max_steps is None:
        # 30 donor lifetimes: residual survival < 1e-13
        max_steps = int(np.ceil(
            30.0 * float(np.ravel(Td)[0]) / dye_lagtime)) + 1

    probs = _pair_rate_tables(d_name, a_name, d_centers, a_centers,
                              dye_params, dye_lagtime, dyelibrary)
    logp = jnp.log(jnp.asarray(np.maximum(probs, 1e-300), jnp.float32))
    logp_d = jnp.log(jnp.asarray(
        np.maximum(np.asarray(d_tprobs), 1e-300), jnp.float32))
    logp_a = jnp.log(jnp.asarray(
        np.maximum(np.asarray(a_tprobs), 1e-300), jnp.float32))
    log_deq = jnp.log(jnp.asarray(
        np.maximum(np.asarray(d_eqs), 1e-300), jnp.float32))
    log_aeq = jnp.log(jnp.asarray(
        np.maximum(np.asarray(a_eqs), 1e-300), jnp.float32))

    key = jax.random.PRNGKey(rng_seed)
    kd, ka, kloop = jax.random.split(key, 3)
    d0 = jax.random.categorical(kd, log_deq, shape=(n_samples,))
    a0 = jax.random.categorical(ka, log_aeq, shape=(n_samples,))

    def cond(state):
        step, d, a, alive, steps, outcome, k = state
        return jnp.any(alive) & (step < max_steps)

    def body(state):
        step, d, a, alive, steps, outcome, k = state
        k, k1, k2_, k3 = jax.random.split(k, 4)
        # outcome indices: 0 rad, 1 nonrad, 2 RET, 3 stay excited
        o = jax.random.categorical(k1, logp[d, a], axis=-1)
        resolved = alive & (o != 3)
        outcome = jnp.where(resolved, o, outcome)
        steps = steps + alive.astype(jnp.int32)
        alive = alive & (o == 3)
        d_next = jax.random.categorical(k2_, logp_d[d], axis=-1)
        a_next = jax.random.categorical(k3, logp_a[a], axis=-1)
        d = jnp.where(alive, d_next, d)
        a = jnp.where(alive, a_next, a)
        return (step + 1, d, a, alive, steps, outcome, k)

    init = (jnp.int32(0), d0, a0,
            jnp.ones(n_samples, bool),
            jnp.zeros(n_samples, jnp.int32),
            jnp.full(n_samples, 3, jnp.int32), kloop)
    _, _, _, _, steps, outcome, _ = jax.lax.while_loop(cond, body, init)

    return (np.asarray(steps),
            _OUTCOMES[np.asarray(outcome)])


def make_dye_msm(centers, t_counts, pdb, resseq, dyename, dyelibrary,
                 center_n=None, outdir='./', save_dye_xtc=False):
    """Align a dye to a residue, drop clashed states, rebuild the dye
    MSM. (reference: dye_lifetimes.py:360)"""
    placed = centers.copy()
    placed.xyz = r0c.align_full_dye_to_res(pdb, placed, resseq,
                                           dyename, dyelibrary)
    keep = r0c.remove_touches_protein_dye_traj(pdb, placed, resseq)
    if len(keep) == 0:
        return np.array([0]), np.array([0]), np.array([])

    if save_dye_xtc:
        tag = ''.join(dyename.split(' '))
        placed[list(keep)].save(os.path.join(
            outdir, f'center{center_n}-aligned-to-{resseq}-{tag}.xtc'))

    clashed = np.setdiff1d(np.arange(len(placed)), keep)
    pruned = r0c.remove_bad_states(clashed, t_counts)
    tprobs, eqs = builders.normalize(pruned, calculate_eq_probs=True)[1:]
    return tprobs, eqs, keep


def calc_lifetimes(pdb_center_num, d_centers, d_tcounts, a_centers,
                   a_tcounts, resSeqs, dyenames, dye_lagtime,
                   n_samples=1000, dye_treatment='Monte-carlo',
                   outdir='./', save_dye_trj=False, save_dye_msm=False,
                   save_dye_centers=False, save_k2_r2=False,
                   rng_seed=None):
    """Dye-emission lifetimes and outcomes for one protein center.
    (reference: dye_lifetimes.py:422)"""
    dyelibrary = r0c.load_library()
    dye_params = r0c.get_dye_overlap(dyenames[0], dyenames[1])

    pdb, center_n = pdb_center_num

    d_tprobs, d_mod_eqs, d_indxs = make_dye_msm(
        d_centers, d_tcounts, pdb[0], resSeqs[0], dyenames[0],
        dyelibrary, center_n=center_n, outdir=outdir,
        save_dye_xtc=save_dye_centers)
    a_tprobs, a_mod_eqs, a_indxs = make_dye_msm(
        a_centers, a_tcounts, pdb[0], resSeqs[1], dyenames[1],
        dyelibrary, center_n=center_n, outdir=outdir,
        save_dye_xtc=save_dye_centers)

    if np.sum(a_mod_eqs) == 0 or np.sum(d_mod_eqs) == 0:
        return [], []

    if save_dye_msm:
        np.save('%s/center%s-%s-%s-eqs.npy' % (
            outdir, center_n, ''.join(dyenames[0].split(' ')),
            resSeqs[0]), d_mod_eqs)
        np.save('%s/center%s-%s-%s-eqs.npy' % (
            outdir, center_n, ''.join(dyenames[1].split(' ')),
            resSeqs[1]), a_mod_eqs)
        np.save('%s/center%s-%s-%s-tps.npy' % (
            outdir, center_n, ''.join(dyenames[0].split(' ')),
            resSeqs[0]), d_tprobs)
        np.save('%s/center%s-%s-%s-tps.npy' % (
            outdir, center_n, ''.join(dyenames[1].split(' ')),
            resSeqs[1]), a_tprobs)

    seeds = np.random.SeedSequence(rng_seed).spawn(n_samples)

    if dye_treatment == 'Monte-carlo':
        events = np.array([
            resolve_excitation(
                dyenames[0], dyenames[1], d_tprobs, a_tprobs,
                d_mod_eqs, a_mod_eqs, d_centers, a_centers, dye_params,
                dye_lagtime, dyelibrary, seeds[i])
            for i in range(n_samples)], dtype='O')

        if save_dye_trj:
            if len(d_indxs) > 0:
                dtrj = np.array([np.searchsorted(d_indxs, e)
                                 for e in events[:, 2]], dtype=object)
                np.save('%s/center%s-%s-%s-dtrj.npy' % (
                    outdir, center_n, dyenames[0], resSeqs[0]), dtrj)
            if len(a_indxs) > 0:
                atrj = np.array([np.searchsorted(a_indxs, e)
                                 for e in events[:, 3]], dtype=object)
                np.save('%s/center%s-%s-%s-atrj.npy' % (
                    outdir, center_n, dyenames[1], resSeqs[1]), atrj)
        lifetimes = events[:, 0]
        outcomes = events[:, 1]
    elif dye_treatment == 'Monte-carlo-device':
        if save_dye_trj:
            raise exception.ImproperlyConfigured(
                "save_dye_trj requires dye_treatment='Monte-carlo': "
                'the lockstep device MC does not record per-photon '
                'state paths')
        lifetimes, outcomes = resolve_excitations_device(
            dyenames[0], dyenames[1], d_tprobs, a_tprobs,
            d_mod_eqs, a_mod_eqs, d_centers, a_centers, dye_params,
            dye_lagtime, dyelibrary, n_samples=n_samples,
            rng_seed=rng_seed if rng_seed is not None else 0)
    elif dye_treatment == 'static':
        events = np.array(explicit_static_dyes(
            dyenames[0], dyenames[1], d_mod_eqs, a_mod_eqs, d_centers,
            a_centers, dye_params, dyelibrary, n_samples, rng_seed),
            dtype='O')
        lifetimes = events[:, 0]
        outcomes = events[:, 1]
    elif dye_treatment == 'isotropic':
        lifetimes, outcomes, k2s, FEs, eqs = fully_averaged_explict_dyes(
            dyenames[0], dyenames[1], d_mod_eqs, a_mod_eqs, d_centers,
            a_centers, dye_params, dyelibrary, n_samples, rng_seed)
        if save_k2_r2:
            np.save('%s/%s-%s-per_state_k2s.npy'
                    % (outdir, resSeqs[0], resSeqs[1]), k2s)
            np.save('%s/%s-%s-per_state_FEs.npy'
                    % (outdir, resSeqs[0], resSeqs[1]), FEs)
            np.save('%s/%s-%s-per_state_eqs.npy'
                    % (outdir, resSeqs[0], resSeqs[1]), eqs)
    else:
        raise ValueError('Unknown dye_treatment %r' % dye_treatment)

    lifetimes = np.array(lifetimes, dtype=float) * dye_lagtime  # ns
    return lifetimes, outcomes


def _sample_lifetimes_guarenteed_photon(states, lifetimes, outcomes,
                                        rng_seed=None):
    """Draw (photon id, lifetime) per visited state, redrawing
    non-radiative events. (reference: dye_lifetimes.py:535)"""
    rng = np.random.default_rng(rng_seed)
    channel = {'radiative': 0, 'energy_transfer': 1}

    photons = np.empty(len(states), dtype=int)
    lts = np.empty(len(states))
    for i, state in enumerate(states):
        n_events = len(lifetimes[state])
        if all(o == 'non_radiative' for o in outcomes[state]):
            # the reference's redraw loop (dye_lifetimes.py:535) hangs
            # forever here; fail loudly instead
            raise exception.DataInvalid(
                'state %s has only non-radiative events (n=%d): no '
                'photon can be drawn — increase n_samples or check '
                'the dye rates' % (state, n_events))
        pick = rng.choice(n_events)
        while outcomes[state][pick] == 'non_radiative':
            pick = rng.choice(n_events)    # no photon: redraw
        if outcomes[state][pick] not in channel:
            raise ValueError(
                'Unexpected outcome %r for state %s event %s'
                % (outcomes[state][pick], state, pick))
        photons[i] = channel[outcomes[state][pick]]
        lts[i] = lifetimes[state][pick]
    return photons, lts


def sample_lifetimes_guarenteed_photon(frames, t_probs, eqs, lifetimes,
                                       outcomes, rng_seed=None):
    """One burst: protein-MSM chain + guaranteed photons at the given
    frames. (reference: dye_lifetimes.py:587)"""
    rng = np.random.default_rng(rng_seed)
    start = rng.choice(t_probs.shape[0], p=eqs)
    chain = synthetic_data.synthetic_trajectory(
        t_probs, start, int(np.amax(frames)) + 1, random_state=rng)

    visited = chain[frames]
    photons, lts = _sample_lifetimes_guarenteed_photon(
        visited, lifetimes, outcomes, rng_seed=rng)
    return photons, lts, visited


def remake_prot_MSM_from_lifetimes(lifetimes, prot_tcounts, resSeqs,
                                   dyenames, outdir='./',
                                   prot_eqs=None):
    """Rebuild the protein MSM after removing unlabelable states.
    (reference: dye_lifetimes.py:633)"""
    bad_states = r0c.find_dyeless_states(lifetimes)
    logger.info('%d of %d protein states had steric clashes for '
                'labeling pair: %s-%s.', len(bad_states),
                len(prot_tcounts), resSeqs[0], resSeqs[1])

    if prot_eqs is not None and len(bad_states):
        lost = np.sum(np.asarray(prot_eqs)[bad_states])
        logger.info('This was %.2f%% of the original equilibrium '
                    'probability.', 100 * lost)
        if lost > 0.2:
            logger.warning('Lots of equilibrium probability lost.')

    trimmed = r0c.remove_bad_states(bad_states, prot_tcounts)
    _, new_tprobs, new_eqs = builders.normalize(
        trimmed, calculate_eq_probs=True)

    os.makedirs(outdir, exist_ok=True)
    base = '%s-%s-%s-%s' % (resSeqs[0], ''.join(dyenames[0].split(' ')),
                            resSeqs[1], ''.join(dyenames[1].split(' ')))
    np.save(os.path.join(outdir, base + '-eqs.npy'), new_eqs)
    np.save(os.path.join(outdir, base + '-t_prbs.npy'), new_tprobs)
    return new_tprobs, new_eqs


def run_mc(resSeq, prot_tcounts, dyenames, MSM_frames, dye_dir, outdir,
           time_correction, save_photon_trjs=False,
           save_burst_frames=False, rng_seed=None):
    """Full burst MC for one labeling pair, reading the per-center
    lifetime events from disk. (reference: dye_lifetimes.py:702)"""
    events_path = os.path.join(
        dye_dir, 'events-%s-%s.npy' % (resSeq[0], resSeq[1]))
    lifetime_outcomes = np.load(events_path, allow_pickle=True)

    lifets = lifetime_outcomes[:, 0]
    outcomes = lifetime_outcomes[:, 1]

    base = '%s-%s-%s-%s' % (resSeq[0], ''.join(dyenames[0].split(' ')),
                            resSeq[1], ''.join(dyenames[1].split(' ')))
    new_tprobs = np.load(os.path.join(outdir, 'MSMs',
                                      base + '-t_prbs.npy'))
    new_eqs = np.load(os.path.join(outdir, 'MSMs', base + '-eqs.npy'))

    seeds = np.random.SeedSequence(rng_seed).spawn(len(MSM_frames))
    sampling = np.array([
        sample_lifetimes_guarenteed_photon(
            frames, new_tprobs, new_eqs, lifets, outcomes,
            rng_seed=seeds[i])
        for i, frames in enumerate(MSM_frames)], dtype='O')

    if save_burst_frames:
        os.makedirs(os.path.join(outdir, 'protein-trajs'),
                    exist_ok=True)
        np.save(os.path.join(
            outdir, 'protein-trajs',
            '%s-%s-%s.npy' % (resSeq[0], resSeq[1], time_correction)),
            sampling[:, 2])

    FEs, d_lifetimes, a_lifetimes = \
        extract_fret_efficiency_lifetimes(sampling)

    os.makedirs(os.path.join(outdir, 'Lifetimes'), exist_ok=True)
    os.makedirs(os.path.join(outdir, 'FEs'), exist_ok=True)
    if save_photon_trjs:
        photon_ids = ra.RaggedArray([b for b in sampling[:, 0]])
        ra.save(os.path.join(
            outdir, 'FEs', 'photon-trace-%s-%s-%s.h5'
            % (resSeq[0], resSeq[1], time_correction)), photon_ids)
    np.save(os.path.join(outdir, 'FEs', 'FE-%s-%s-%s.npy'
                         % (resSeq[0], resSeq[1], time_correction)),
            FEs)
    np.save(os.path.join(
        outdir, 'Lifetimes', 'd_lifetimes-%s-%s-%s.npy'
        % (resSeq[0], resSeq[1], time_correction)), d_lifetimes)
    np.save(os.path.join(
        outdir, 'Lifetimes', 'a_lifetimes-%s-%s-%s.npy'
        % (resSeq[0], resSeq[1], time_correction)), a_lifetimes)
    return FEs, d_lifetimes, a_lifetimes


def remake_msms(resSeq, prot_tcounts, dye_dir, dyenames, orig_eqs,
                outdir):
    """(reference: dye_lifetimes.py:688)"""
    events_path = os.path.join(
        dye_dir, 'events-%s-%s.npy' % (resSeq[0], resSeq[1]))
    lifetime_outcomes = np.load(events_path, allow_pickle=True)
    lifets = lifetime_outcomes[:, 0]
    return remake_prot_MSM_from_lifetimes(
        lifets, prot_tcounts, resSeq, dyenames,
        outdir=os.path.join(outdir, 'MSMs'), prot_eqs=orig_eqs)


def calc_per_state_FE(events):
    """FRET efficiency per protein state from a lifetimes/outcomes
    events array. (reference: dye_lifetimes.py:746)"""
    ratios = np.full(len(events), np.nan)
    for i, outcomes in enumerate(events[:, 1]):
        outcomes = np.asarray(outcomes)
        if outcomes.size:
            via_transfer = np.count_nonzero(
                outcomes == 'energy_transfer')
            emitted = via_transfer + np.count_nonzero(
                outcomes == 'radiative')
            ratios[i] = via_transfer / emitted
    return ratios


def single_exp_decay(t, Io, tau):
    """(reference: dye_lifetimes.py:772)"""
    return Io * np.exp(-t / tau)


def _fit_decay(model, t, y, p0):
    return curve_fit(model, t, y, p0=p0)[0]


def fit_single_exp(t, y, p0):
    return tuple(_fit_decay(single_exp_decay, t, y, p0))


def _lifetime_hist(lifetimes, hist_bins, hist_range):
    counts, edges = np.histogram(lifetimes, range=hist_range,
                                 bins=hist_bins)
    return (edges[:-1] + edges[1:]) / 2, counts


def _donor_Td(donor_name):
    if donor_name is None:
        return np.array([4.0])
    _, _, Td = r0c.get_dye_overlap(donor_name, donor_name)
    return Td


def fit_lifetimes_single_exp(lifetimes, donor_name=None, hist_bins=100,
                             hist_range=(0, 25)):
    """(reference: dye_lifetimes.py:795)"""
    t, counts = _lifetime_hist(lifetimes, hist_bins, hist_range)
    Td = _donor_Td(donor_name)
    Io = np.amax(counts)
    fit_I, fit_tau = fit_single_exp(t, counts,
                                    p0=np.array([Io, Td[0]]))
    return t, counts, fit_I, fit_tau


def double_exp_decay(t, Io1, Io2, tau1, tau2):
    """(reference: dye_lifetimes.py:842)"""
    return Io1 * np.exp(-t / tau1) + Io2 * np.exp(-t / tau2)


def fit_double_exp(t, y, p0):
    return tuple(_fit_decay(double_exp_decay, t, y, p0))


def fit_lifetimes_double_exp(lifetimes, donor_name=None, hist_bins=100,
                             hist_range=(0, 25)):
    """(reference: dye_lifetimes.py:868)"""
    t, counts = _lifetime_hist(lifetimes, hist_bins, hist_range)
    guess_tau = _donor_Td(donor_name)[0]
    half = np.amax(counts) / 2
    fits = fit_double_exp(
        t, counts, p0=np.array([half, half, guess_tau, guess_tau]))
    return (t, counts) + fits


def fit_lifetimes_single_exp_high_throughput(
        lifetimes, donor_name=None, hist_bins=100, hist_range=(0, 25)):
    """(reference: dye_lifetimes.py:952)"""
    t, counts = _lifetime_hist(lifetimes, hist_bins, hist_range)
    Td = _donor_Td(donor_name)
    Io = np.amax(counts)
    try:
        fit_I, fit_tau = fit_single_exp(t, counts,
                                        p0=np.array([Io, Td[0]]))
    except RuntimeError:
        return t, counts, 0, 100
    return t, counts, fit_I, fit_tau


def extract_fret_efficiency_lifetimes(lifetime_samples):
    """(reference: dye_lifetimes.py:919)"""
    FEs, from_donor, from_acceptor = [], [], []
    for burst in lifetime_samples:
        photons = np.asarray(burst[0])
        lts = np.asarray(burst[1])
        FEs.append(photons.sum() / len(photons))
        from_donor.append(lts[photons == 0])
        from_acceptor.append(lts[photons == 1])
    return (np.array(FEs), np.array(from_donor, dtype=object),
            np.array(from_acceptor, dtype=object))
