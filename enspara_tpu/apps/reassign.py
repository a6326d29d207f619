"""`reassign` app: assign full datasets to existing cluster centers.
(reference: enspara/apps/reassign.py)
"""

import argparse
import logging
import os
import pickle
import sys
import time

from .. import exception
from .. import ra
from ..cluster.util import reassign
from ..util.load import concatenate_trjs
from ..util.parallel import auto_nprocs

logger = logging.getLogger(__name__)


def process_command_line(argv):
    parser = argparse.ArgumentParser(
        prog='reassign',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    parser.add_argument(
        '--centers', required=True,
        help='Center structures (as a pickle) to use for reassignment.')
    parser.add_argument(
        '--trajectories', required=True, nargs='+', action='append',
        help='The aligned xtc files to cluster.')
    parser.add_argument(
        '--topology', required=True, action='append', dest='topologies',
        help='The topology file for the trajectories.')
    parser.add_argument(
        '--atoms', default='(name CA or name C or name N or name CB)',
        help='Atom selection to reassign with.')
    parser.add_argument(
        '--output-path', default=None,
        help='Output path for results (distances, assignments).')
    parser.add_argument(
        '-m', '--mem-fraction', default=0.5, type=float,
        help='Fraction of total RAM to use for batch sizing.')
    parser.add_argument(
        '--distances', required=True,
        help='Path to h5 for distances to nearest center.')
    parser.add_argument(
        '--assignments', required=True,
        help='Path to h5 for assignments to nearest center.')

    args = parser.parse_args(argv[1:])

    if args.mem_fraction >= 1 or args.mem_fraction <= 0:
        raise exception.ImproperlyConfigured(
            'Flag --mem-fraction must be in range (0, 1). Got %s'
            % args.mem_fraction)
    if len(args.topologies) != len(args.trajectories):
        raise exception.ImproperlyConfigured(
            'The number of --topology and --trajectory flags must '
            'agree.')
    if args.output_path is None:
        args.output_path = os.path.dirname(args.centers)
    for trjset in args.trajectories:
        for trj in trjset:
            open(trj, 'r').close()
    return args


def main(argv=None):
    if argv is None:
        argv = sys.argv
    from ..util.backend import select_platform
    select_platform()   # honors $ENSPARA_TPU_PLATFORM
    from ..util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    args = process_command_line(argv)

    tick = time.perf_counter()
    with open(args.centers, 'rb') as f:
        centers = concatenate_trjs(pickle.load(f), args.atoms,
                                   auto_nprocs())
    logger.info('Loaded %s centers with %s atoms in %.1f seconds.',
                len(centers), centers.n_atoms,
                time.perf_counter() - tick)

    assig, dist = reassign(
        args.topologies, args.trajectories,
        [args.atoms] * len(args.topologies),
        centers=centers, frac_mem=args.mem_fraction)

    ra.save(args.distances, dist)
    ra.save(args.assignments, assig)
    logger.info('Wrote distances at %s.', args.distances)
    logger.info('Wrote assignments at %s.', args.assignments)
    return 0


def entry_point():
    return main(sys.argv)


if __name__ == '__main__':
    sys.exit(main(sys.argv))
