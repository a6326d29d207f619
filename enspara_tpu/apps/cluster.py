"""`cluster` app: cluster trajectories or features into a state space.
(reference: enspara/apps/cluster.py)
"""

import argparse
import logging
import os
import sys

import numpy as np

from .. import exception
from .. import ra
from ..cluster import KCenters, KHybrid, KMedoids
from ..cluster import util
from ..util.log import timed
from . import util as apputil

logger = logging.getLogger(__name__)

FEATURE_DISTANCES = ['euclidean', 'manhattan']
TRAJECTORY_DISTANCES = ['rmsd']
ALGORITHMS = {'kcenters': KCenters, 'khybrid': KHybrid,
              'kmedoids': KMedoids}


def process_command_line(argv):
    """(reference: apps/cluster.py:69)"""
    parser = argparse.ArgumentParser(
        prog='cluster',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Cluster a set (or several sets) of trajectories '
                    'into a single state space based upon RMSD.')

    input_args = parser.add_argument_group('Input Settings')
    input_data_group = parser.add_mutually_exclusive_group(required=True)
    input_data_group.add_argument(
        '--features', nargs='+',
        help='The h5 file containing observations and features.')
    input_data_group.add_argument(
        '--trajectories', nargs='+', action='append',
        help='List of paths to aligned trajectory files to cluster.')
    input_args.add_argument(
        '--topology', action='append', dest='topologies',
        help='The topology file for the trajectories, once per '
             '--trajectories flag.')

    cluster_args = parser.add_argument_group('Clustering Settings')
    cluster_args.add_argument(
        '--algorithm', required=True,
        choices=['khybrid', 'kcenters', 'kmedoids'],
        help='The clustering algorithm to use.')
    cluster_args.add_argument(
        '--atoms', action='append',
        help='Atom selection used for RMSD clustering; once globally or '
             'once per --trajectories flag.')
    cluster_args.add_argument(
        '--cluster-radius', default=None, type=float,
        help='Produce clusters with a maximum distance to cluster '
             'center of this value.')
    cluster_args.add_argument(
        '--cluster-number', default=None, type=int,
        help='Produce at least this number of clusters.')
    cluster_args.add_argument(
        '--cluster-distance', default=None,
        choices=FEATURE_DISTANCES + TRAJECTORY_DISTANCES,
        help='The metric for measuring distances.')
    cluster_args.add_argument(
        '--cluster-iterations', default=None, type=int,
        help='The number of refinement iterations to perform (khybrid/'
             'kmedoids).')
    cluster_args.add_argument(
        '--init-center-inds', default=None, type=str,
        help='Path to a .npy of initial center positions (restarts).')
    cluster_args.add_argument(
        '--init-assignments', default=None, type=str,
        help='Path to an .h5 of initial assignments (restarts).')
    cluster_args.add_argument(
        '--init-distances', default=None, type=str,
        help='Path to an .h5 of initial distances (restarts).')
    cluster_args.add_argument(
        '--checkpoint', default=None, type=str,
        help='Checkpoint directory (util.checkpoint layout). If it '
             'already holds a manifest, clustering warm-starts from '
             'it (kmedoids only, like the --init-* flags); the final '
             'clustering state is always saved back to it.')
    cluster_args.add_argument(
        '--subsample', default=1, type=int,
        help='Take only every nth frame when loading trajectories.')
    cluster_args.add_argument(
        '--random-state', default=None, type=int,
        help='Random seed for medoid proposals.')
    cluster_args.add_argument(
        '--locality-sort', default=False, action='store_true',
        help='Reorder frames by a 1-pivot RMSD key before clustering '
             'so the tri-skip kernels can elide DMA for provably '
             'inert tiles even on temporally shuffled data (kcenters '
             '+ rmsd only). Finds a different — equally valid — '
             'Gonzalez covering than the unsorted order.')
    cluster_args.add_argument(
        '--precision', default='fp32', choices=['fp32', 'bf16'],
        help='bf16 streams frames as bfloat16 through the fused TPU '
             'k-centers kernels: ~2x frame capacity per chip at ~4e-3 '
             'relative distance rounding (kcenters + rmsd on TPU '
             'only).')

    output_args = parser.add_argument_group('Output Settings')
    output_args.add_argument(
        '--no-reassign', default=False, action='store_true',
        help='Do not do a reassigment step after subsampled clustering.')
    output_args.add_argument(
        '--distances', required=True, action=apputil.readable_dir,
        help='The location to write the distances file.')
    output_args.add_argument(
        '--center-features', required=True, action=apputil.readable_dir,
        help='The location to write the cluster center structures.')
    output_args.add_argument(
        '--assignments', required=True, action=apputil.readable_dir,
        help='The location to write assignments of frames to clusters.')
    output_args.add_argument(
        '--center-indices', required=False, action=apputil.readable_dir,
        help='Location for cluster center indices output (npy).')

    args = parser.parse_args(argv[1:])

    if args.features:
        args.features = apputil.expand_files([args.features])[0]
        if args.cluster_distance not in FEATURE_DISTANCES:
            raise exception.ImproperlyConfigured(
                'The given distance (%s) is not compatible with '
                'features.' % args.cluster_distance)
        if args.subsample != 1 and len(args.features) == 1:
            raise exception.ImproperlyConfigured(
                'Subsampling is not supported for h5 inputs.')
        if args.topologies:
            raise exception.ImproperlyConfigured(
                'When --features is specified, --topology is '
                'unneccessary.')
        if args.atoms:
            raise exception.ImproperlyConfigured(
                'Option --atoms is only meaningful when clustering '
                'trajectories.')
    elif args.trajectories and args.topologies:
        args.trajectories = apputil.expand_files(args.trajectories)
        if not args.cluster_distance or args.cluster_distance == 'rmsd':
            args.cluster_distance = 'rmsd'
        else:
            raise exception.ImproperlyConfigured(
                'Option --cluster-distance must be rmsd when clustering '
                'trajectories.')
        if not args.atoms:
            raise exception.ImproperlyConfigured(
                'Option --atoms is required when clustering '
                'trajectories.')
        if len(args.atoms) == 1:
            args.atoms = args.atoms * len(args.trajectories)
        elif len(args.atoms) != len(args.trajectories):
            raise exception.ImproperlyConfigured(
                'Flag --atoms must be provided either once or the same '
                'number of times --trajectories is supplied.')
        if len(args.topologies) != len(args.trajectories):
            raise exception.ImproperlyConfigured(
                'The number of --topology and --trajectory flags must '
                'agree.')
    else:
        raise exception.ImproperlyConfigured(
            'Either --features or both of --trajectories and '
            '--topologies are required.')

    if args.cluster_radius is None and args.cluster_number is None:
        raise exception.ImproperlyConfigured(
            'At least one of --cluster-radius and --cluster-number is '
            'required to cluster.')

    args.Clusterer = ALGORITHMS[args.algorithm]
    if args.Clusterer is KCenters and args.cluster_iterations is not None:
        raise exception.ImproperlyConfigured(
            '--cluster-iterations only has an effect when using an '
            'iterative clustering scheme (e.g. khybrid).')
    if args.Clusterer is KMedoids and args.cluster_radius is not None:
        raise exception.ImproperlyConfigured(
            '--cluster-radius only has an effect when using kcenters or '
            'khybrid.')
    if args.precision != 'fp32' and (
            args.Clusterer is not KCenters
            or args.cluster_distance != 'rmsd'):
        raise exception.ImproperlyConfigured(
            '--precision bf16 is only implemented for kcenters with '
            'the rmsd metric (the fused TPU streaming path).')
    if args.locality_sort and (
            args.Clusterer is not KCenters
            or args.cluster_distance != 'rmsd'):
        raise exception.ImproperlyConfigured(
            '--locality-sort is only implemented for kcenters with '
            'the rmsd metric (the fused TPU tri-skip path).')
    if args.Clusterer is not KMedoids:
        for name in (args.init_center_inds, args.init_distances,
                     args.init_assignments):
            if name:
                raise exception.ImproperlyConfigured(
                    '--init-center-inds, --init-distances, and '
                    '--init-assignments are only implemented for '
                    'kmedoids')
    if args.checkpoint and os.path.exists(
            os.path.join(args.checkpoint, 'manifest.json')):
        if args.Clusterer is not KMedoids:
            raise exception.ImproperlyConfigured(
                'Warm-starting from --checkpoint is only implemented '
                'for kmedoids (matching the --init-* flags).')
        if (args.init_center_inds or args.init_distances
                or args.init_assignments):
            raise exception.ImproperlyConfigured(
                'Give either --checkpoint or the --init-* flags for a '
                'restart, not both.')
    return args


def main(argv=None):
    """(reference: apps/cluster.py:287)"""
    if argv is None:
        argv = sys.argv
    from ..util.backend import select_platform
    select_platform()   # honors $ENSPARA_TPU_PLATFORM
    from ..util.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    # Multi-host mode (the analog of the reference's `mpirun -n N
    # cluster ...`, apps/cluster.py:287 under MPI): when the
    # coordinator env triple is set, join the jax.distributed world
    # BEFORE any jax use. Every process runs the same SPMD program
    # over the global frame mesh; only process 0 writes outputs.
    coord = os.environ.get('ENSPARA_TPU_COORDINATOR')
    if coord:
        from ..parallel.mesh import initialize_distributed
        initialize_distributed(
            coordinator_address=coord,
            num_processes=int(os.environ['ENSPARA_TPU_NUM_PROCESSES']),
            process_id=int(os.environ['ENSPARA_TPU_PROCESS_ID']))

    args = process_command_line(argv)

    import jax as _jax
    if _jax.process_count() > 1 and args.subsample > 1:
        raise exception.ImproperlyConfigured(
            'multi-host runs do not support --subsample reassignment '
            'yet; reassign separately with the reassign app')

    lengths, data = util.load_trjs_or_features(args)

    kwargs = {}
    if args.cluster_iterations is not None:
        if args.Clusterer is KHybrid:
            kwargs['kmedoids_updates'] = int(args.cluster_iterations)
        elif args.Clusterer is KMedoids:
            kwargs['n_iters'] = int(args.cluster_iterations)
    if args.cluster_radius is not None:
        kwargs['cluster_radius'] = args.cluster_radius
    if args.random_state is not None:
        kwargs['random_state'] = args.random_state

    if args.precision != 'fp32':
        kwargs['precision'] = args.precision
    if args.locality_sort:
        kwargs['sort'] = 'locality'

    clustering = args.Clusterer(
        metric=args.cluster_distance,
        n_clusters=args.cluster_number,
        **kwargs)

    kwargs_restart = {}
    if args.checkpoint and os.path.exists(
            os.path.join(args.checkpoint, 'manifest.json')):
        from ..util.checkpoint import load_clustering_checkpoint
        state = load_clustering_checkpoint(args.checkpoint)
        kwargs_restart['distances'] = state['distances'].reshape(-1)
        kwargs_restart['assignments'] = \
            state['assignments'].reshape(-1)
        kwargs_restart['cluster_center_inds'] = \
            state['center_indices']
        logger.info('Warm-starting from checkpoint %s (%d centers).',
                    args.checkpoint, len(state['center_indices']))
    if args.Clusterer is KMedoids:
        if args.init_distances:
            d = ra.load(args.init_distances)
            kwargs_restart['distances'] = \
                d._data if isinstance(d, ra.RaggedArray) else \
                np.asarray(d).reshape(-1)
        if args.init_assignments:
            a = ra.load(args.init_assignments)
            kwargs_restart['assignments'] = \
                a._data if isinstance(a, ra.RaggedArray) else \
                np.asarray(a).reshape(-1)
        if args.init_center_inds:
            kwargs_restart['cluster_center_inds'] = \
                np.load(args.init_center_inds)
        clustering.fit(data, **kwargs_restart)
    else:
        clustering.fit(data)
    del data

    logger.info('Clustered %s frames into %s clusters in %s seconds.',
                sum(lengths), len(clustering.centers_),
                clustering.runtime_)

    if args.checkpoint:
        from ..util.checkpoint import save_clustering_checkpoint
        r = clustering.result_
        save_clustering_checkpoint(
            args.checkpoint, np.asarray(r.distances),
            np.asarray(r.assignments), np.asarray(r.center_indices),
            metadata={'algorithm': args.algorithm,
                      'subsample': args.subsample})
        logger.info('Saved clustering checkpoint to %s.',
                    args.checkpoint)

    result = clustering.result_.partition(lengths)

    if _jax.process_index() == 0:
        # pure-host I/O happens on one process (the reference's
        # rank-0 writes, apps/cluster.py:359-366); all device compute
        # above ran SPMD on every process
        with timed('Wrote center indices in %.2f sec.', logger.info):
            util.write_centers_indices(
                args.center_indices,
                [(t, f * args.subsample)
                 for t, f in result.center_indices])
        with timed('Wrote center structures in %.2f sec.', logger.info):
            util.write_centers(result, args)
        util.write_assignments_and_distances_with_reassign(result, args)
    if _jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('cluster app outputs')

    logger.info('Success! Data can be found in %s.',
                os.path.dirname(args.distances))
    return 0


def entry_point():
    return main(sys.argv)


if __name__ == '__main__':
    sys.exit(main(sys.argv))
