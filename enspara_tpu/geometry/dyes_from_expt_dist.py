"""smFRET forward prediction from dye point clouds.
(reference: enspara/geometry/dyes_from_expt_dist.py)

Empirical dye-position point clouds are aligned onto labeled residues
(CA/CB/N local frame), sterically pruned against the protein, and the
resulting dye-dye distance distributions drive Monte Carlo sampling of
FRET efficiencies over MSM trajectories.
"""

import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import scipy.cluster.hierarchy
import scipy.sparse
import scipy.spatial.distance
from scipy.stats import kurtosis, skew

from .. import ra
from ..exception import DataInvalid
from ..msm.synthetic_data import synthetic_trajectory

__all__ = [
    'FRET_efficiency', 'make_distribution', 'load_dye', 'norm_vec',
    'determine_rot_mat', 'find_atom_index', 'calc_cb_coords',
    'rodrigues_rotation', 'remove_touches_protein', 'cluster_grids',
    'align_dye_to_res', 'pairwise_distance_distribution',
    'dye_distance_distribution', 'sample_FE_probs',
    'sample_FRET_histograms', 'convert_photon_times',
    'histogram_to_match_expt', 'Sum_sq_resid', 'normalize_array',
    'remake_data_from_hist', 'calc_4_moments', 'calc_2_3_4_moments',
]


def FRET_efficiency(dists, r0, offset=0):
    """E = r0^6 / (r0^6 + (r + offset)^6). (reference: :13)"""
    r06 = r0 ** 6
    return r06 / (r06 + ((dists + offset) ** 6))


def make_distribution(probs, bin_edges):
    """(distance, probability) rows per state: bin centers paired with
    unit-mass probabilities, one ragged row per state."""
    rows = []
    for p, edges in zip(probs, bin_edges):
        p = np.asarray(p, dtype=np.float64)
        e = np.asarray(edges)
        centers = (e[1:] + e[:-1]) / 2.
        rows.append(np.stack([centers, p / p.sum()], axis=1))
    return ra.RaggedArray(rows)


def load_dye(dye):
    """Load a FRET dye point cloud by name or path.
    (reference: :26)"""
    from .. import io as io_mod
    from ..data import dye_library_path

    if os.path.exists(dye):
        return io_mod.load(dye)
    folder = dye_library_path()
    for sub in ('', 'point-clouds', 'structures'):
        path = os.path.join(folder, sub, '%s.pdb' % dye)
        if os.path.exists(path):
            return io_mod.load(path)
    known = sorted(glob.glob(os.path.join(folder, '**', '*.pdb'),
                             recursive=True))
    names = ', '.join(os.path.basename(p)[:-4] for p in known)
    raise DataInvalid(
        '%s is not a path to a pdb or a known dye. Known dyes: %s'
        % (dye, names))


def norm_vec(vec):
    """Unit-length row(s); accepts one vector or a stack of them."""
    vec = np.asarray(vec)
    if vec.ndim == 1:
        return vec / np.sqrt(vec @ vec)
    mags = np.sqrt((vec * vec).sum(axis=-1))
    return vec / mags[:, None]


def divide_chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def int_norm(xs, ys):
    dx = xs[1] - xs[0]
    return ys / np.sum(ys * dx)


def find_atom_index(pdb, resSeq, atom_name):
    """Index of the first atom called ``atom_name`` in the first
    residue with the given resSeq (None when absent)."""
    matches = pdb.top.select(
        f'resSeq {int(resSeq)} and name {atom_name}')
    return int(matches[0]) if len(matches) else None


def calc_cb_coords(pdb, resSeqs=None):
    """Ideal CB positions from backbone geometry (handles GLY/PRO).
    (reference: :146)"""
    CA_CB = 0.153   # canonical CA->CB bond length, nm
    if resSeqs is None:
        sel = pdb.topology.select
        picks = {nm: sel('name ' + nm) for nm in ('N', 'CA', 'C')}
    else:
        wanted = np.asarray(resSeqs).reshape(-1)
        picks = {nm: np.array([find_atom_index(pdb, r, nm)
                               for r in wanted])
                 for nm in ('N', 'CA', 'C')}
    n, ca, c = (pdb.xyz[0][picks[nm]] for nm in ('N', 'CA', 'C'))

    away_from_n = norm_vec(ca - n)
    away_from_c = norm_vec(ca - c)
    plane_normal = norm_vec(np.cross(away_from_n, away_from_c))
    bisector = norm_vec(ca - ((n + c) / 2.))
    tilt = np.pi / 6.   # CB sits 30 degrees out of the backbone plane
    return (ca + np.sin(tilt) * CA_CB * bisector
            + np.cos(tilt) * CA_CB * plane_normal)


def determine_rot_mat(pdb, resSeq):
    """Local frame at a residue: z along CA->CB, N in the z-y plane.
    (reference: :90)"""
    origin = pdb.xyz[0, find_atom_index(pdb, resSeq, 'CA')]
    n_xyz = pdb.xyz[0, find_atom_index(pdb, resSeq, 'N')]

    z_axis = norm_vec(calc_cb_coords(pdb, resSeqs=resSeq)[0] - origin)
    x_axis = norm_vec(np.cross(norm_vec(n_xyz - origin), z_axis))
    y_axis = norm_vec(np.cross(z_axis, x_axis))
    return np.array([x_axis, y_axis, z_axis]), origin


def rodrigues_rotation(v, k, theta, centers=None):
    """Rotate coordinate frames around per-frame axes k by theta.
    (reference: :196)"""
    pivot = np.zeros(3) if centers is None else centers[:, None, :]
    rel = v - pivot
    axis = k[:, None, :]

    in_plane = rel * np.cos(theta)
    swung = np.cross(axis, rel) * np.sin(theta)
    axial = np.einsum('ijk,ijk->ij', axis, rel)
    along_axis = axis * axial[..., None] * (1 - np.cos(theta))
    return in_plane + swung + along_axis + pivot


def _remove_touches_protein(coords, pdb, probe_radius=0.17):
    clearance = np.array([a.radius for a in pdb.top.atoms]) \
        + probe_radius
    separation = scipy.spatial.distance.cdist(coords, pdb.xyz[0])
    untouched = (separation > clearance[None, :]).all(axis=1)
    return coords[untouched]


def remove_touches_protein(coords, pdb, probe_radius=0.17):
    """Drop cloud points within (vdW + probe) of any protein atom;
    chunked to bound the pairwise-distance memory. (reference: :251)"""
    max_dist_points = 5e7
    if coords.shape[0] * pdb.xyz[0].shape[0] > max_dist_points:
        out = [
            _remove_touches_protein(chunk, pdb, probe_radius)
            for chunk in divide_chunks(coords, 2048)]
        return np.vstack([np.zeros((0, 3))] + out)
    return _remove_touches_protein(coords, pdb, probe_radius)


def cluster_grids(point_cloud, spacing, n_clouds=all):
    """Keep the largest contiguous cloud(s). (reference: :295)"""
    labels = scipy.cluster.hierarchy.fclusterdata(
        point_cloud, t=spacing, criterion='distance')
    labels -= labels.min()

    by_size = np.argsort(-np.bincount(labels))
    keep = by_size if n_clouds is all else by_size[:n_clouds]
    member_rows = [np.flatnonzero(labels == lab) for lab in keep]
    return point_cloud[np.concatenate(member_rows)]


def align_dye_to_res(pdb, dye_coords, resSeq, placement=None):
    """Place a dye cloud in the local frame of the given residue.

    ``placement`` lets a caller reuse one residue frame for several
    dye clouds (it is ``determine_rot_mat``'s return value).
    """
    if placement is None:
        placement = determine_rot_mat(pdb, resSeq=resSeq)
    frame, origin = placement
    return np.einsum('...j,jk->...k', dye_coords, frame) + origin


def bincount_dists(dists, bin_width=0.1):
    """Fixed-width histogram from zero, one spare bin past the max."""
    top = float(np.max(dists))
    n_bins = int(top / bin_width) + 2
    return np.histogram(dists, range=(0, bin_width * n_bins),
                        bins=n_bins)


def int_norm_hist(xs, ys):
    """Scale ys to unit integral over xs; handles both bin-count
    (len(ys) == len(xs) - 1) and sampled-curve (trapezoid) inputs."""
    counts_per_bin = (ys if ys.shape[0] == xs.shape[0] - 1
                      else (ys[1:] + ys[:-1]) / 2.)
    return ys / np.sum(counts_per_bin * np.diff(xs))


def _merge_histograms(counts, bin_edges, weights=None):
    """(reference: :415)"""
    if weights is None:
        weights = np.ones(len(counts))
    else:
        weights = np.array(weights).reshape(-1)
    lens = [c.shape[0] for c in counts]
    n_pads = np.max(lens) - np.asarray(lens)
    padded = np.array([
        np.hstack([counts[n], np.zeros(n_pads[n])])
        for n in range(len(counts))])
    tot_counts = np.sum(padded * weights[:, None], axis=0)
    return tot_counts, bin_edges[int(np.argmax(lens))]


def pairwise_distance_distribution(coords1, coords2, bin_width=0.1):
    """Histogram of all cross distances (chunked). (reference: :354)"""
    max_dist_points = 5e7
    if coords1.shape[0] * coords2.shape[0] > max_dist_points:
        if coords1.shape[0] > coords2.shape[0]:
            max_coords, min_coords = coords1, coords2
        else:
            max_coords, min_coords = coords2, coords1
        counts, bin_edges = [], []
        for chunk in divide_chunks(max_coords, 2048):
            d = scipy.spatial.distance.cdist(min_coords, chunk)
            c, b = bincount_dists(d, bin_width)
            counts.append(c)
            bin_edges.append(b)
        tot_counts, bin_edges = _merge_histograms(counts, bin_edges)
    else:
        d = scipy.spatial.distance.cdist(coords1, coords2)
        tot_counts, bin_edges = bincount_dists(d, bin_width)
    return int_norm_hist(bin_edges, tot_counts), bin_edges


def _dye_distance_distribution(pdb, dye1, dye2, resSeq_list,
                               cluster_grid_points=False):
    """(reference: :455)"""
    sites = (resSeq_list[0], resSeq_list[1])

    # every (dye, labeling site) combination gets its own pruned cloud
    clouds = {}
    site_frames = {site: determine_rot_mat(pdb, site) for site in sites}
    for tag, dye in (('donor', dye1), ('acceptor', dye2)):
        for site in sites:
            pts = align_dye_to_res(pdb, dye.xyz[0], site,
                                   placement=site_frames[site])
            pts = remove_touches_protein(pts, pdb, probe_radius=0.2)
            if cluster_grid_points:
                pts = cluster_grids(pts, spacing=0.25, n_clouds=1)
            clouds[tag, site] = pts

    # the labeling is orientation-agnostic: average the two ways of
    # assigning the dye pair to the site pair
    hists, edges = zip(
        *(pairwise_distance_distribution(clouds['donor', a],
                                         clouds['acceptor', b])
          for a, b in (sites, sites[::-1])))
    return _merge_histograms(list(hists), list(edges),
                             weights=[0.5, 0.5])


def dye_distance_distribution(trj, dye1, dye2, resSeq_list,
                              cluster_grid_points=False, n_procs=1):
    """Per-frame dye-pair distance distributions over a trajectory.
    (reference: :506)"""
    frames = [trj[i] for i in range(len(trj))]

    def one(frame):
        return _dye_distance_distribution(
            frame, dye1, dye2, resSeq_list,
            cluster_grid_points=cluster_grid_points)

    with ThreadPoolExecutor(max_workers=max(n_procs, 1)) as ex:
        outputs = list(ex.map(one, frames))
    probs = ra.RaggedArray([o[0] for o in outputs])
    bin_edges = ra.RaggedArray([o[1] for o in outputs])
    return probs, bin_edges


def sample_FE_probs(dist_distribution, states, R0, rng=None):
    """Draw a dye-dye distance per visited state and convert to FRET
    efficiency. (reference: :546)"""
    if rng is None:
        rng = np.random.default_rng()
    bin_width = (dist_distribution[0][1, 0]
                 - dist_distribution[0][0, 0])
    dists = np.empty(len(states))
    for i, state in enumerate(states):
        row = dist_distribution[state]
        dist = rng.choice(row[:, 0], p=row[:, 1])
        dists[i] = dist + rng.random() * bin_width - bin_width / 2.
    return FRET_efficiency(dists, R0)


def _sample_FRET_histograms(MSM_frames, T, populations,
                            dist_distribution, R0, n_photon_std,
                            rng=None):
    """One photon burst: MSM chain + per-photon acceptor/donor coin
    flips. (reference: :562)"""
    if rng is None:
        rng = np.random.default_rng()
    n_frames = int(np.amax(MSM_frames)) + 1

    initial_state = rng.choice(np.arange(T.shape[0]), p=populations)
    trj = synthetic_trajectory(T, initial_state, n_frames,
                               random_state=rng)

    FRET_probs = sample_FE_probs(dist_distribution, trj[MSM_frames],
                                 R0, rng=rng)
    acceptor_emissions = rng.random(FRET_probs.shape[0]) <= FRET_probs

    if n_photon_std is None:
        FRET_val = np.mean(acceptor_emissions)
        FRET_std = None
    else:
        chunks = [np.mean(s) for s in
                  divide_chunks(acceptor_emissions, n_photon_std)]
        FRET_std = np.std(chunks)
        FRET_val = np.mean(acceptor_emissions)

    return FRET_val, FRET_std, trj


def sample_FRET_histograms(T, populations, dist_distribution,
                           MSM_frames, R0, n_procs=1,
                           n_photon_std=None, random_state=None):
    """Sample an MSM to regenerate experimental FRET distributions.
    (reference: :607)

    Returns ``(FEs (n_bursts, 2), trajs)``.
    """
    if scipy.sparse.issparse(T):
        T = np.asarray(T.todense())
    seeds = np.random.SeedSequence(random_state).spawn(len(MSM_frames))

    def one(i):
        return _sample_FRET_histograms(
            MSM_frames[i], T=T, populations=populations,
            dist_distribution=dist_distribution, R0=R0,
            n_photon_std=n_photon_std,
            rng=np.random.default_rng(seeds[i]))

    with ThreadPoolExecutor(max_workers=max(n_procs, 1)) as ex:
        FE = list(ex.map(one, range(len(MSM_frames))))

    FE = np.array(FE, dtype=object)
    return FE[:, 0:2], FE[:, 2]


def convert_photon_times(inter_photon_times, lagtime, slowing_factor):
    """Inter-photon times (us) -> cumulative MSM steps.
    (reference: :669)"""
    steps_per_us = 1000 / (lagtime * slowing_factor)

    def to_steps(times):
        return np.cumsum(np.asarray(times) * steps_per_us, dtype=int)

    return np.array([to_steps(t) for t in inter_photon_times],
                    dtype=object)


def histogram_to_match_expt(pred_data, expt_data):
    """(reference: :703)"""
    bin_centers = expt_data[:, 0]
    bin_width = bin_centers[1] - bin_centers[0]
    lo = bin_centers[0] - bin_width / 2
    hi = bin_centers[-1] + bin_width / 2
    nbins = len(bin_centers)
    if np.ndim(pred_data) == 1:
        counts, _ = np.histogram(pred_data, range=[lo, hi], bins=nbins)
        return counts / counts.sum()
    probs = []
    for row in pred_data:
        counts, _ = np.histogram(row, range=[lo, hi], bins=nbins)
        probs.append(counts / counts.sum())
    return np.array(probs)


def Sum_sq_resid(expt_data, pred_data):
    """(reference: :722)"""
    return np.sum((pred_data - expt_data) ** 2, axis=1)


def normalize_array(array):
    """(reference: :726)"""
    if np.ndim(array) == 1:
        return (array - np.amin(array)) / (np.amax(array)
                                           - np.amin(array))
    return [(a - np.amin(a)) / (np.amax(a) - np.amin(a))
            for a in array]


def remake_data_from_hist(histo_data, rng=None):
    """(reference: :735)"""
    if rng is None:
        rng = np.random.default_rng()
    bin_centers = histo_data[:, 0]
    bin_width = bin_centers[1] - bin_centers[0]
    bin_counts = histo_data[:, 1].astype(int)
    rebuilt = [
        rng.uniform(low=bin_centers[i] - bin_width / 2,
                    high=bin_centers[i] + bin_width / 2,
                    size=int(c))
        for i, c in enumerate(bin_counts)]
    return np.concatenate(rebuilt)


def calc_4_moments(histo_data):
    """(reference: :758)"""
    axis = None if np.ndim(histo_data) == 1 else 1
    return np.vstack((np.mean(histo_data, axis=axis),
                      np.std(histo_data, axis=axis),
                      skew(histo_data, axis=axis),
                      kurtosis(histo_data, axis=axis, fisher=True)))


def calc_2_3_4_moments(histo_data):
    axis = None if np.ndim(histo_data) == 1 else 1
    return np.vstack((np.std(histo_data, axis=axis),
                      skew(histo_data, axis=axis),
                      kurtosis(histo_data, axis=axis, fisher=True)))
