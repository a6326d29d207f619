#!/usr/bin/env python
"""North-star pipeline benchmark (BASELINE.md): k-centers-cluster 1M
frames to 1000 states + top-20 implied timescales, on whatever devices
are present. Prints a JSON dict of stage timings.

The reference target is <60 s on a v5p-8 (>=100x single-node MPI
enspara); this script reports per-stage wall time so single-chip runs
extrapolate.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_FRAMES = 1_000_000
N_ATOMS = 64
N_CLUSTERS = 1000
LAG = 10


def main():
    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from enspara_tpu.cluster.engine import (kcenters_device,
                                            prepare_sharded)
    from enspara_tpu.msm import builders
    from enspara_tpu.msm.eigen_device import eigenspectrum_reversible
    from enspara_tpu.msm.transition_matrices import \
        assigns_to_counts_device
    from enspara_tpu.parallel import frame_mesh

    import jax.numpy as jnp

    timings = {}
    mesh = frame_mesh()

    # synthesize in HBM directly (no host->device transfer)
    t0 = time.perf_counter()

    @jax.jit
    def synth(key):
        kb, kd, kn = jax.random.split(key, 3)
        base = jax.random.normal(kb, (N_ATOMS, 3), jnp.float32)
        drift = jax.random.normal(kd, (N_FRAMES, 1, 1), jnp.float32)
        noise = jax.random.normal(kn, (N_FRAMES, N_ATOMS, 3),
                                  jnp.float32)
        frames = base[None] + 0.3 * drift * base[None] + 0.1 * noise
        return frames - jnp.mean(frames, axis=1, keepdims=True)

    data_sh, _ = prepare_sharded(synth(jax.random.PRNGKey(0)),
                                 'rmsd', mesh)
    np.asarray(jnp.sum(data_sh[0]))  # force materialization
    timings['synthesize_on_device_s'] = round(
        time.perf_counter() - t0, 2)

    # compile (cached across runs)
    t0 = time.perf_counter()
    kcenters_device(data_sh, metric='rmsd', n_clusters=2,
                    k_max=N_CLUSTERS, mesh=mesh)
    timings['compile_s'] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    res = kcenters_device(data_sh, metric='rmsd',
                          n_clusters=N_CLUSTERS, k_max=N_CLUSTERS,
                          mesh=mesh)
    timings['kcenters_1000_s'] = round(time.perf_counter() - t0, 2)
    assert res.n_found == N_CLUSTERS

    assigns = res.assignments.reshape(100, -1)  # 100 pseudo-trajs
    mask = np.ones_like(assigns, dtype=bool)
    counts = np.asarray(assigns_to_counts_device(
        assigns, mask, LAG, N_CLUSTERS))  # warm/compile
    t0 = time.perf_counter()
    counts = np.asarray(assigns_to_counts_device(
        assigns, mask, LAG, N_CLUSTERS))
    timings['transition_counts_s'] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    _, T, pi = builders.transpose(counts.astype(np.float64))
    timings['builder_s'] = round(time.perf_counter() - t0, 2)

    eigenspectrum_reversible(T, pi=pi, n_eigs=21,
                             method='eigh')  # warm/compile
    t0 = time.perf_counter()
    vals, _ = eigenspectrum_reversible(T, pi=pi, n_eigs=21,
                                       method='eigh')
    ts = -LAG / np.log(np.clip(vals[1:21], 1e-30, 1 - 1e-12))
    timings['top20_timescales_s'] = round(time.perf_counter() - t0, 2)

    # the full production lag SCAN (10 lags) as one batched launch:
    # traced-lag counting + transpose builder + batched eigh
    from enspara_tpu.msm.eigen_device import implied_timescales_batched
    lag_scan = list(range(LAG, LAG * 11, LAG))
    implied_timescales_batched(assigns, lag_scan, n_times=20)  # warm
    t0 = time.perf_counter()
    its = implied_timescales_batched(assigns, lag_scan, n_times=20)
    timings['lag_scan_10x_top20_s'] = round(time.perf_counter() - t0, 2)
    assert its.shape == (10, 20)

    timings['pipeline_total_s'] = round(sum(
        v for k, v in timings.items()
        if k.endswith('_s') and k not in ('synthesize_on_device_s',
                                          'compile_s',
                                          'lag_scan_10x_top20_s')), 2)
    timings['n_devices'] = len(jax.devices())
    timings['pairs_per_sec'] = round(
        N_FRAMES * N_CLUSTERS / timings['kcenters_1000_s'], 0)
    print(json.dumps(timings))


if __name__ == '__main__':
    main()
