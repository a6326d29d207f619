"""Automated API-surface parity: every public (non-underscore,
module-level) name in the reference's Python modules must exist in the
corresponding module here, module-for-module, with an explicit waiver
list for the handful of reference-internal helpers we deliberately do
not mirror.

The name lists are a frozen snapshot of the reference tree
(/root/reference/enspara, ast-extracted), so this test runs without
the reference present and pins the surface against accidental
regression. The mpi/ subpackage maps to parallel/ (device-mesh
collectives replace MPI, SURVEY §2.4).
"""

import importlib

import pytest

# reference module -> (our module, space-separated public names)
SURFACE = {
    'ra/ra.py': ('enspara_tpu.ra',
                 'zeros_like where save load partition_indices '
                 'partition_list RaggedArray'),
    'cluster/kcenters.py': ('enspara_tpu.cluster.kcenters',
                            'KCenters kcenters_mpi kcenters'),
    'cluster/kmedoids.py': ('enspara_tpu.cluster.kmedoids',
                            'KMedoids kmedoids ctr_ids_mpi'),
    'cluster/hybrid.py': ('enspara_tpu.cluster.hybrid',
                          'KHybrid hybrid'),
    'cluster/util.py': (
        'enspara_tpu.cluster.util',
        'MolecularClusterMixin ClusterResult assign_to_nearest_center '
        'find_cluster_centers load_frames expand_files load_features '
        'load_trajectories load_asymm_frames load_trjs_or_features '
        'write_centers_indices write_centers '
        'write_assignments_and_distances_with_reassign compute_batches '
        'determine_batch_size batch_reassign reassign'),
    'cluster/save_states.py': ('enspara_tpu.cluster.save_states',
                               'unique_states save_states'),
    'msm/msm.py': ('enspara_tpu.msm.msm', 'MSM'),
    'msm/transition_matrices.py': (
        'enspara_tpu.msm.transition_matrices',
        'TrimMapping assigns_to_counts eigenspectrum trim_disconnected '
        'eq_probs'),
    'msm/builders.py': ('enspara_tpu.msm.builders',
                        'mle transpose normalize'),
    'msm/timescales.py': ('enspara_tpu.msm.timescales',
                          'calc_imp_times implied_timescales'),
    'msm/bace.py': ('enspara_tpu.msm.bace',
                    'getInds bace mergeTwoClosestStates renumberMap '
                    'calcDMat multiDist multiDistHelper absorb '
                    'baysean_prune'),
    'msm/bootstrap.py': ('enspara_tpu.msm.bootstrap', 'bootstrap MSMs'),
    'msm/synthetic_data.py': ('enspara_tpu.msm.synthetic_data',
                              'synthetic_trajectory synthetic_ensemble'),
    'tpt/core.py': ('enspara_tpu.tpt.core', 'committors mfpts'),
    'tpt/tpt.py': ('enspara_tpu.tpt.tpt',
                   'reactive_fluxes net_fluxes reactive_populations'),
    'tpt/path.py': ('enspara_tpu.tpt.path', 'top_path paths'),
    'info_theory/mutual_info.py': (
        'enspara_tpu.info_theory.mutual_info',
        'mi_matrix weighted_mi mi_matrix_serial joint_counts '
        'mutual_information mi_to_nmi_apc deconvolute_network '
        'mi_to_nmi mi_to_apc channel_capacity_normalization '
        'check_features_states'),
    'info_theory/entropy.py': (
        'enspara_tpu.info_theory.entropy',
        'Q_from_assignments relative_entropy_per_state '
        'relative_entropy_msm energy_to_probability shannon_entropy '
        'kl_divergence js_divergence'),
    'info_theory/exposons.py': (
        'enspara_tpu.info_theory.exposons',
        'exposons exposons_from_sasas get_sidechain_atom_ids '
        'condense_sidechain_sasas'),
    'cards/cards.py': ('enspara_tpu.cards.cards', 'cards cards_matrices'),
    'cards/disorder.py': (
        'enspara_tpu.cards.disorder',
        'transitions traj_ord_disord_times create_disorder_traj '
        'assign_order_disorder transition_stats aggregate_mean_times'),
    'cards/featurizers.py': ('enspara_tpu.cards.featurizers',
                             'RotamerFeaturizer'),
    'geometry/rotamer.py': (
        'enspara_tpu.geometry.rotamer',
        'dihedral_angles is_buffered_transition get_gates phi_rotamers '
        'psi_rotamers chi_rotamers all_rotamers'),
    'geometry/pockets.py': (
        'enspara_tpu.geometry.pockets',
        'xyz_to_mdtraj create_grid determine_touches_protein '
        'get_pocket_cells cluster_pocket_cells get_pockets'),
    'geometry/rmsf.py': ('enspara_tpu.geometry.rmsf', 'rmsf_calc'),
    'geometry/dyes_from_expt_dist.py': (
        'enspara_tpu.geometry.dyes_from_expt_dist',
        'FRET_efficiency make_distribution load_dye norm_vec '
        'divide_chunks int_norm determine_rot_mat find_atom_index '
        'calc_cb_coords rodrigues_rotation remove_touches_protein '
        'cluster_grids align_dye_to_res bincount_dists '
        'pairwise_distance_distribution dye_distance_distribution '
        'sample_FE_probs sample_FRET_histograms convert_photon_times '
        'int_norm_hist histogram_to_match_expt Sum_sq_resid '
        'normalize_array remake_data_from_hist calc_4_moments '
        'calc_2_3_4_moments'),
    'geometry/explicit_r0_calc.py': (
        'enspara_tpu.geometry.explicit_r0_calc',
        'load_dye load_library calc_R0 get_dye_overlap '
        'remove_touches_protein_dye_traj get_dipole_components '
        'get_dye_center assemble_dye_r_mu sample_dye_coords calc_k2_r '
        'align_full_dye_to_res map_dye_on_protein find_dyeless_states '
        'remove_bad_states remove_dyeless_msm_states simulate_burst_k2'),
    'geometry/dye_lifetimes.py': (
        'enspara_tpu.geometry.dye_lifetimes',
        'FRET_rate calc_dye_radiative_rates calc_energy_transfer_prob '
        'explicit_static_dyes fully_averaged_explict_dyes '
        'resolve_excitation make_dye_msm calc_lifetimes '
        'sample_lifetimes_guarenteed_photon remake_prot_MSM_from_lifetimes '
        'remake_msms run_mc calc_per_state_FE single_exp_decay '
        'fit_single_exp fit_lifetimes_single_exp double_exp_decay '
        'fit_double_exp fit_lifetimes_double_exp '
        'extract_fret_efficiency_lifetimes '
        'fit_lifetimes_single_exp_high_throughput'),
    'mpi/ops.py': (
        'enspara_tpu.parallel.ops',
        'convert_local_indices assemble_striped_array '
        'assemble_striped_ragged_array striped_array_max '
        'striped_array_mean distribute_frame randind'),
    'mpi/io.py': ('enspara_tpu.parallel.io',
                  'load_h5_as_striped load_npy_as_striped '
                  'load_trajectory_as_striped'),
    'util/load.py': ('enspara_tpu.util.load',
                     'sound_trajectory load_as_concatenated '
                     'concatenate_trjs shared_array_like_trj'),
    'util/parallel.py': ('enspara_tpu.util.parallel',
                         'auto_nprocs pool_dense2d pool_sparse2d'),
}

# reference-internal helpers deliberately not mirrored, with reasons
WAIVED = {
    # camelCase internals of the reference's BACE agglomeration loop
    # (MSMBuilder-era remnants, undocumented, not used outside
    # msm/bace.py there); our BACE is vectorized differently and its
    # public contract (bace/baysean_prune/absorb) is pinned by
    # tests/test_bace.py + test_bace_reference_spec.py and a live
    # 3-seed partition oracle
    'msm/bace.py': {'getInds', 'mergeTwoClosestStates', 'calcDMat',
                    'multiDist', 'multiDistHelper'},
}


@pytest.mark.parametrize('ref_module', sorted(SURFACE))
def test_surface(ref_module):
    our_module, names = SURFACE[ref_module]
    mod = importlib.import_module(our_module)
    waived = WAIVED.get(ref_module, set())
    missing = [n for n in names.split()
               if n not in waived and not hasattr(mod, n)]
    assert not missing, (
        '%s is missing reference names %s (from %s)'
        % (our_module, missing, ref_module))
