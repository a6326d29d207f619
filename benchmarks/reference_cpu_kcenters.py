#!/usr/bin/env python
"""Euclidean k-centers, reference vs ours, on identical input.

The reference's flagship RMSD clustering cannot run here (mdtraj's C
QCP kernel is not installed), but its euclidean k-centers loop CAN:
the per-iteration work is one point-to-set euclidean distance pass
(libdist euclidean — the numpy stand-in used by the oracle loader is
the same memory-bound computation as the Cython kernel on one core)
plus numpy argmax/minimum bookkeeping (reference cluster/kcenters.py:
108-241). Both sides cluster the same 100k x 64 float32 feature array
to 100 clusters.

    python reference_cpu_kcenters.py ref    # reference loop (1 core)
    python reference_cpu_kcenters.py ours   # our engine (current backend)

Prints one JSON line per invocation, merged into
``reference-cpu-kcenters-result.json``. Center indices are also
cross-checked: with the same seed state (first center = frame 0,
deterministic farthest-point updates) both implementations must pick
identical centers.
"""

import json
import os
import sys
import time
from os.path import dirname, join

import numpy as np

sys.path.insert(0, dirname(dirname(__file__)))          # repo root
sys.path.insert(0, join(dirname(dirname(__file__)), 'tests'))

OUT = join(dirname(__file__), 'reference-cpu-kcenters-result.json')

N_FRAMES, N_DIM, K = 100_000, 64, 100


def _pin_cpu():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except ImportError:
        pass


def _features():
    rng = np.random.RandomState(4)
    # clustered blobs + noise so farthest-point has real structure
    centers = rng.normal(scale=4.0, size=(32, N_DIM))
    labels = rng.randint(0, 32, N_FRAMES)
    return (centers[labels]
            + rng.normal(size=(N_FRAMES, N_DIM))).astype(np.float32)


def stage_ref():
    _pin_cpu()
    from _reference_oracle import load_reference
    load_reference()
    from enspara.cluster.kcenters import kcenters

    X = _features()
    t0 = time.perf_counter()
    res = kcenters(X, 'euclidean', n_clusters=K, dist_cutoff=0)
    dt = time.perf_counter() - t0
    return {'ref_kcenters_100k_x64_k100_s': round(dt, 2),
            'ref_center_indices_head': [int(i) for i in
                                        res.center_indices[:10]]}


def stage_ours():
    import jax

    from enspara_tpu.cluster.kcenters import kcenters
    from enspara_tpu.util.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    X = _features()
    kcenters(X, 'euclidean', n_clusters=K)              # compile
    t0 = time.perf_counter()
    res = kcenters(X, 'euclidean', n_clusters=K)
    dt = time.perf_counter() - t0
    return {'ours_kcenters_100k_x64_k100_s': round(dt, 2),
            'ours_backend': jax.default_backend(),
            'ours_center_indices_head': [int(i) for i in
                                         res.center_indices[:10]]}


STAGES = {'ref': stage_ref, 'ours': stage_ours}


def main():
    res = STAGES[sys.argv[1]]()
    try:
        with open(OUT) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(res)
    with open(OUT, 'w') as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
