"""`compute-shannon-entropy` app: per-residue rotamer Shannon
entropies, normalized by channel capacity.
(reference: enspara/apps/compute-shannon-entropy.py)
"""

import argparse
import logging
import sys

import numpy as np

from .. import exception
from ..cards import featurizers as feat
from ..info_theory import mutual_info as mut
from ..info_theory import entropy as ent
from ..util.parallel import auto_nprocs
from .util import readable_dir, expand_files

logger = logging.getLogger(__name__)


def process_command_line(argv):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.RawDescriptionHelpFormatter,
        description='Compute per-residue Shannon entropies from '
                    'rotamer distributions.')

    input_args = parser.add_argument_group('Input Settings')
    input_args.add_argument(
        '--trajectories', required=True, nargs='+',
        help='List of paths to aligned trajectory files.')
    input_args.add_argument(
        '--topology', required=True, action='append',
        help='The topology file for the trajectories.')

    cards_args = parser.add_argument_group('CARDS Settings')
    cards_args.add_argument(
        '--buffer-size', default=15, type=int,
        help='Size of buffer zone between rotameric states, degrees.')
    cards_args.add_argument(
        '--processes', default=max(1, auto_nprocs() // 4), type=int,
        help='Number of processes to use.')

    output_args = parser.add_argument_group('Output Settings')
    output_args.add_argument(
        '--entropies', required=True, action=readable_dir,
        help='Where to write per-residue entropies (CSV).')

    args = parser.parse_args(argv[1:])
    if not (0 < args.buffer_size < 360):
        raise exception.ImproperlyConfigured(
            'The given buffer size (%s) is not possible.'
            % args.buffer_size)
    args.trajectories = expand_files([args.trajectories])[0]
    return args


def compute_rotamer_counts(rotamers):
    """Rotamer-state occupancy counts per dihedral from the (diagonal
    of the) joint counts. (reference:
    apps/compute-shannon-entropy.py:155)"""
    jc = None
    for x in rotamers.feature_trajectories_:
        n = int(np.max(rotamers.n_feature_states_))
        jc_i = mut.joint_counts(x, x, n, n).astype(np.int64)
        jc = jc_i if jc is None else jc + jc_i
    n_obs_a_i = jc.sum(axis=-1)
    return np.asarray([n_obs_a_i[i, i] for i in range(jc.shape[0])])


def compute_dihedral_shannon_entropy(probs):
    """(reference: apps/compute-shannon-entropy.py:197)"""
    return np.array([ent.shannon_entropy(p) for p in probs])


def sum_dihedral_entropies(dihedral_entropies, resi_mapping, n_resis):
    """(reference: apps/compute-shannon-entropy.py:220)"""
    out = np.zeros(n_resis)
    for i in range(n_resis):
        out[i] = dihedral_entropies[resi_mapping == i].sum()
    return out


def compute_channel_capacities(n_states_array, resi_list, n_resis):
    """(reference: apps/compute-shannon-entropy.py:243)"""
    cc = np.zeros(n_resis)
    for i in range(n_resis):
        rots = n_states_array[resi_list == i]
        cc[i] = np.sum(np.log(rots)) if len(rots) else 0.0
    return cc


def compute_residue_shannon_entropies(dihedral_entropies, topology_file,
                                      atom_inds, n_states):
    """(reference: apps/compute-shannon-entropy.py:270)"""
    from .. import io as io_mod

    structure = io_mod.load(topology_file)
    n_resis = structure.top.n_residues
    num_dihedrals = dihedral_entropies.shape[0]

    resi_list = np.zeros(num_dihedrals)
    for i in range(num_dihedrals):
        identifying_atom = atom_inds[i][1]
        resi_list[i] = \
            structure.top.atom(int(identifying_atom)).residue.resSeq - 1

    total = sum_dihedral_entropies(dihedral_entropies, resi_list,
                                   n_resis)
    capacity = compute_channel_capacities(np.asarray(n_states),
                                          resi_list, n_resis)
    with np.errstate(invalid='ignore', divide='ignore'):
        normalized = np.where(capacity > 0, total / np.where(
            capacity > 0, capacity, 1), 0.0)
    return normalized, np.unique(resi_list + 1)


def compute_shannon_entropies(args, trj_list):
    """(reference: apps/compute-shannon-entropy.py:332)"""
    rotamers = feat.RotamerFeaturizer(args.buffer_size, args.processes)
    rotamers.fit(trj_list)

    counts = compute_rotamer_counts(rotamers)
    P_a = counts / counts.sum(axis=-1)[..., None]
    entropy_per_dihedral = compute_dihedral_shannon_entropy(P_a)

    return compute_residue_shannon_entropies(
        entropy_per_dihedral, args.topology[0],
        rotamers.atom_indices_, rotamers.n_feature_states_)


def save_all_entropies(entropies, residues, filename):
    """(reference: apps/compute-shannon-entropy.py:382)"""
    np.savetxt(filename, np.vstack((residues, entropies)).T,
               delimiter=',')
    return 0


def load_trajs(args):
    """Generator of loaded trajectories from parsed CLI args.
    (reference: apps/compute-shannon-entropy.py:124)"""
    from .. import io as io_mod
    top = io_mod.load(args.topology[0]).top
    return (io_mod.load(t, top=top) for t in args.trajectories)


def main(argv=None):
    if argv is None:
        argv = sys.argv
    from ..util.backend import select_platform
    select_platform()   # honors $ENSPARA_TPU_PLATFORM
    from ..util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    args = process_command_line(argv)

    gen = load_trajs(args)

    residue_entropy, resi_list = compute_shannon_entropies(args, gen)
    save_all_entropies(residue_entropy, resi_list, args.entropies)
    logger.info('Saved per-residue entropies to %s', args.entropies)
    return 0


def entry_point():
    return main(sys.argv)


if __name__ == '__main__':
    sys.exit(main(sys.argv))
