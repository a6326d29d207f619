#!/usr/bin/env python
"""North-star pipeline on an 8-device VIRTUAL mesh (sharded vs serial).

Runs the full north-star pipeline (k-centers clustering -> masked
transition counts -> builder -> top-20 implied timescales) twice on a
host-platform CPU mesh — once sharded over all devices with the real
production collectives (all_gather argmax / psum counting / lag-axis
partitioning), once on a single device — and asserts the results
agree. This records, every round, that the multi-chip pipeline's
collective structure is CORRECT end-to-end; ICI throughput itself
cannot be measured without real chips (BASELINE.md north-star
hardware is a v5p-8).

Sharded-equals-serial is the same oracle the reference CI uses for
its MPI phase (enspara/test/test_apps_cluster_mpi.py:128-139, run
under mpirun -n 2) — with one principled difference. The reference's
ranks run byte-identical serial distance code, so it can assert
bit-equal center indices; our sharded and single-device runs are
DIFFERENT XLA programs (different shard shapes tile reductions
differently), so fp32 distances can differ by ulps and a near-tied
farthest-point argmax may legitimately flip (measured here at 262k
frames / k=256: the first 193 picks match bit-for-bit, then two
centers whose max-distances agree to 3e-8 relative swap order).
Therefore k-centers parity is asserted on what the algorithm
guarantees — the covering radius (its objective) and the center
count — while the stages whose results ARE exact regardless of
program shape (integer transition counts via psum, implied
timescales) keep exact/tight assertions on a shared input.

Writes benchmarks/northstar-mesh-result.json and prints it.
"""

import json
import os
import sys

# must precede any jax import: host-platform device count is latched
# at backend init
N_DEVICES = int(os.environ.get('NORTHSTAR_MESH_DEVICES', '8'))
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={N_DEVICES}'
    ).strip()
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np

N_FRAMES = 262_144
N_ATOMS = 32
N_CLUSTERS = 256
LAG = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from enspara_tpu.cluster.engine import kcenters_device
    from enspara_tpu.msm import builders
    from enspara_tpu.msm.eigen_device import (
        eigenspectrum_reversible, implied_timescales_batched)
    from enspara_tpu.msm.transition_matrices import (
        assigns_to_counts, assigns_to_counts_sharded)
    from enspara_tpu.parallel.mesh import FRAME_AXIS

    devs = jax.devices('cpu')
    assert len(devs) >= N_DEVICES, (len(devs), N_DEVICES)
    mesh = Mesh(np.array(devs[:N_DEVICES]), (FRAME_AXIS,))

    result = {'backend': 'cpu (host-platform virtual mesh)',
              'n_devices': N_DEVICES,
              'jax_version': jax.__version__,
              'timestamp_source': 'end-of-run wall clock, this file '
                                  'written by benchmarks/northstar_mesh.py',
              'note': 'compile_s and warm per-call times are reported '
                      'SEPARATELY: XLA:CPU compile of the sharded '
                      'programs dominates first-call latency and is '
                      'paid once per (shape, mesh) per machine with '
                      'the persistent compile cache',
              'n_frames': N_FRAMES,
              'n_atoms': N_ATOMS, 'k': N_CLUSTERS, 'lag': LAG}

    rng = np.random.default_rng(0)
    base = rng.normal(size=(8, N_ATOMS, 3)).astype(np.float32)
    which = rng.integers(0, 8, N_FRAMES)
    frames = (base[which]
              + 0.1 * rng.normal(size=(N_FRAMES, N_ATOMS, 3))
              ).astype(np.float32)
    frames -= frames.mean(axis=1, keepdims=True)

    # --- sharded pipeline over the mesh
    t0 = time.perf_counter()
    res_sh = kcenters_device(frames, metric='rmsd',
                             n_clusters=N_CLUSTERS, mesh=mesh)
    result['kcenters_sharded_first_call_s'] = round(
        time.perf_counter() - t0, 2)        # includes XLA:CPU compile
    t0 = time.perf_counter()
    res_sh = kcenters_device(frames, metric='rmsd',
                             n_clusters=N_CLUSTERS, mesh=mesh)
    result['kcenters_sharded_s'] = round(time.perf_counter() - t0, 2)
    assert res_sh.n_found == N_CLUSTERS

    a2d_sh = np.asarray(res_sh.assignments).reshape(64, -1)
    mask = np.ones_like(a2d_sh, dtype=bool)
    t0 = time.perf_counter()
    C_sh = np.asarray(assigns_to_counts_sharded(
        a2d_sh, mask, LAG, N_CLUSTERS, mesh=mesh))
    result['counts_sharded_first_call_s'] = round(
        time.perf_counter() - t0, 2)        # includes XLA:CPU compile
    t0 = time.perf_counter()
    for _ in range(5):
        C_sh = np.asarray(assigns_to_counts_sharded(
            a2d_sh, mask, LAG, N_CLUSTERS, mesh=mesh))
    result['counts_sharded_s'] = round(
        (time.perf_counter() - t0) / 5, 4)  # warm per-call

    _, T, pi = builders.transpose(C_sh.astype(np.float64))
    vals_sh, _ = eigenspectrum_reversible(T, pi=pi, n_eigs=21,
                                          method='eigh')

    lags = list(range(LAG, LAG * 11, LAG))
    t0 = time.perf_counter()
    its_sh = implied_timescales_batched(a2d_sh, lags, n_times=20,
                                        mesh=mesh)
    result['lag_scan_sharded_s'] = round(time.perf_counter() - t0, 2)

    # --- serial oracle (an explicit 1-device mesh)
    mesh_1 = Mesh(np.array(devs[:1]), (FRAME_AXIS,))
    t0 = time.perf_counter()
    res_1 = kcenters_device(frames, metric='rmsd',
                            n_clusters=N_CLUSTERS, mesh=mesh_1)
    result['kcenters_serial_first_call_s'] = round(
        time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    res_1 = kcenters_device(frames, metric='rmsd',
                            n_clusters=N_CLUSTERS, mesh=mesh_1)
    result['kcenters_serial_s'] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    for _ in range(5):
        C_1d = np.asarray(assigns_to_counts_sharded(
            a2d_sh, mask, LAG, N_CLUSTERS, mesh=mesh_1))
    result['counts_serial_s'] = round((time.perf_counter() - t0) / 5, 4)
    C_1 = assigns_to_counts(a2d_sh, lag_time=LAG,
                            max_n_states=N_CLUSTERS).toarray()
    assert (C_1d == C_1).all()
    its_1 = implied_timescales_batched(a2d_sh, lags, n_times=20)

    # --- sharded == serial (the MPI-phase oracle; see module doc for
    # why k-centers parity is radius-certificate-based)
    assert res_sh.n_found == res_1.n_found == N_CLUSTERS
    r_sh = float(np.asarray(res_sh.distances).max())
    r_1 = float(np.asarray(res_1.distances).max())
    assert abs(r_sh - r_1) <= 1e-5 * max(r_sh, r_1), \
        'sharded vs serial covering radius diverges: %r vs %r' \
        % (r_sh, r_1)
    result['covering_radius'] = [round(r_sh, 6), round(r_1, 6)]
    agree = (np.asarray(res_sh.assignments)
             == np.asarray(res_1.assignments)).mean()
    result['assignment_agreement'] = round(float(agree), 4)
    assert agree > 0.98, agree

    assert (C_sh == C_1).all(), 'sharded vs serial counts diverge'
    # timescales amplify eigenvalue error by lag/(1-lambda), so
    # compare the eigenvalues the two programs computed: fp32 eigh at
    # n=256 is accurate to ~n*eps*||T|| ~ 3e-5 per program, and the
    # lag-sharded and unsharded programs are different XLA programs
    # (measured lambda disagreement 4.7e-5; a mis-mapped lag would be
    # O(1))
    its_sh = np.asarray(its_sh)
    its_1 = np.asarray(its_1)
    assert (np.isnan(its_sh) == np.isnan(its_1)).all()
    lag_col = np.asarray(lags, dtype=np.float64)[:, None]
    lam_sh = np.exp(-lag_col / its_sh)
    lam_1 = np.exp(-lag_col / its_1)
    lam_diff = float(np.nanmax(np.abs(lam_sh - lam_1)))
    assert lam_diff < 3e-4, lam_diff
    result['lag_scan_max_lambda_diff'] = lam_diff

    result['sharded_equals_serial'] = True
    result['top5_timescales'] = [round(float(t), 2)
                                 for t in np.asarray(its_sh)[0][:5]]
    assert vals_sh.shape == (21,)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'northstar-mesh-result.json')
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
