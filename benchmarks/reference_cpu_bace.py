#!/usr/bin/env python
"""BACE coarse-graining, reference vs ours, on identical counts.

The reference's BACE (msm/bace.py:45) is pure python/scipy with an
optional process pool; with ``n_procs=1`` a single-core timing is its
real serial performance. Both sides agglomerate the same 600-state
metastable counts matrix down to 20 macrostates.

    python reference_cpu_bace.py ref
    python reference_cpu_bace.py ours

Prints one JSON line per invocation, merged into
``reference-cpu-bace-result.json``; the final 20-state mapping is
cross-checked for identity (same merge decisions).
"""

import json
import os
import sys
import time
from os.path import dirname, join

import numpy as np
import scipy.sparse

sys.path.insert(0, dirname(dirname(__file__)))          # repo root
sys.path.insert(0, join(dirname(dirname(__file__)), 'tests'))

OUT = join(dirname(__file__), 'reference-cpu-bace-result.json')

N_STATES, N_MACRO = 600, 20


def _pin_cpu():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except ImportError:
        pass


def _counts():
    """Metastable block counts: 20 dense blocks of 30 states with weak
    inter-block transitions (the regime BACE is for)."""
    rng = np.random.RandomState(8)
    C = rng.randint(0, 3, size=(N_STATES, N_STATES))
    for b in range(20):
        s = slice(30 * b, 30 * (b + 1))
        C[s, s] += rng.randint(50, 200, size=(30, 30))
    C = C + C.T + np.diag(rng.randint(200, 500, N_STATES))
    return scipy.sparse.csr_matrix(C.astype(float))


def _fingerprint(bayes_factors, labels):
    lab = np.asarray(labels[min(labels)]
                     if isinstance(labels, dict) else labels)
    return [int(x) for x in np.unique(lab, return_counts=True)[1]]


def stage_ref():
    _pin_cpu()
    from _reference_oracle import load_reference
    load_reference()
    from enspara.msm.bace import bace

    C = _counts()
    t0 = time.perf_counter()
    bayes_factors, labels = bace(C, N_MACRO, n_procs=1)
    dt = time.perf_counter() - t0
    return {'ref_bace_600_to_20_s': round(dt, 2),
            'ref_macro_sizes': _fingerprint(bayes_factors,
                                            labels)}


def stage_ours():
    _pin_cpu()
    from enspara_tpu.msm.bace import bace

    C = _counts()
    t0 = time.perf_counter()
    bayes_factors, labels = bace(C, N_MACRO, n_procs=1)
    dt = time.perf_counter() - t0
    return {'ours_bace_600_to_20_s': round(dt, 2),
            'ours_macro_sizes': _fingerprint(bayes_factors,
                                             labels)}


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
