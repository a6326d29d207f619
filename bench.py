#!/usr/bin/env python
"""Headline benchmark: sharded k-centers RMSD clustering throughput.

Runs the flagship pipeline (BASELINE.json config style: k-centers RMSD
clustering of MD frames) on whatever devices are present and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is QCP-RMSD frame-center pair evaluations per second inside
the full clustering loop (global argmax + cross-shard center fetch +
distance kernel + min-update every iteration), measured with data
resident in HBM (the steady state of a production run) and best-of-3.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); we
normalize against an estimated single-node reference throughput of
2.4e7 QCP pairs/s — mdtraj's threaded C QCP kernel at ~1.5e6
pairs/s/core (64-atom structures) on a 16-core node, which is what
`enspara.cluster` achieves on one machine without MPI.
"""

import json
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 2.4e7  # estimated single-node enspara

N_FRAMES = 1_000_000
N_ATOMS = 64
N_CLUSTERS = 1000


def _backend_alive(timeout_s=180):
    """True if the default jax backend can initialize. Probed in a
    subprocess: when the device tunnel black-holes, backend init hangs
    indefinitely (it does not error), which would hang this benchmark
    before producing its JSON line."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax; jax.devices(); print("ok")'],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    global N_FRAMES, N_CLUSTERS
    degraded = False
    if not _backend_alive():
        # fall back to host so a tunnel outage still yields a
        # (clearly-annotated) result instead of a hang; shrink the
        # problem — the 1M x 1000 size is hours on a CPU core
        import jax
        jax.config.update('jax_platforms', 'cpu')
        degraded = True
        N_FRAMES, N_CLUSTERS = 20_000, 50

    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from enspara_tpu.cluster.engine import (kcenters_device,
                                            kcenters_device_fused,
                                            prepare_rmsd_frames,
                                            prepare_sharded)
    from enspara_tpu.parallel import frame_mesh

    import jax
    import jax.numpy as jnp

    mesh = frame_mesh()

    # synthesize the dataset directly in HBM (no host->device
    # transfer): a correlated random walk so clustering structure is
    # nontrivial; precentered for the QCP kernels
    @jax.jit
    def synth(key):
        kb, kd, kn = jax.random.split(key, 3)
        base = jax.random.normal(kb, (N_ATOMS, 3), jnp.float32)
        drift = jax.random.normal(kd, (N_FRAMES, 1, 1), jnp.float32)
        noise = jax.random.normal(kn, (N_FRAMES, N_ATOMS, 3),
                                  jnp.float32)
        frames = base[None] + 0.3 * drift * base[None] + 0.1 * noise
        return frames - jnp.mean(frames, axis=1, keepdims=True)

    frames = synth(jax.random.PRNGKey(42))
    if jax.default_backend() == 'tpu':
        # production steady state: frames ingested ONCE into the fused
        # kernels' device layout, then clustered (fp32)
        data = prepare_rmsd_frames(
            frames, mesh=mesh if mesh.size > 1 else None)

        def cluster(k):
            return kcenters_device_fused(
                data, n_clusters=k, k_max=N_CLUSTERS,
                mesh=mesh if mesh.size > 1 else None)
    else:
        data_sh, _ = prepare_sharded(frames, 'rmsd', mesh)

        def cluster(k):
            return kcenters_device(data_sh, metric='rmsd',
                                   n_clusters=k, k_max=N_CLUSTERS,
                                   mesh=mesh)

    # compile at the real shapes (tiny k, same static k_max)
    cluster(2)

    best = np.inf
    res = None
    for _ in range(3):
        t0 = time.perf_counter()
        res = cluster(N_CLUSTERS)
        best = min(best, time.perf_counter() - t0)

    assert res.n_found == N_CLUSTERS
    assert res.assignments.max() == N_CLUSTERS - 1

    pairs = N_FRAMES * N_CLUSTERS
    pairs_per_sec = pairs / best

    result = {
        'metric': 'kcenters_qcp_rmsd_pairs_per_sec',
        'value': round(pairs_per_sec, 1),
        'unit': 'pairs/s',
        'vs_baseline': round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
    }
    if degraded:
        result['degraded'] = ('device tunnel unavailable; measured on '
                              'the CPU backend')
    print(json.dumps(result))


if __name__ == '__main__':
    main()
