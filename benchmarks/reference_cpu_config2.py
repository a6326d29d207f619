#!/usr/bin/env python
"""BASELINE config 2's implied-timescales stage, reference vs ours,
on an identical input trace.

The reference's scan (msm/timescales.py:43) is pure Python+scipy —
per lag: sliding-window transition counts (python hstack+coo),
transpose builder, ARPACK eigenspectrum — so a single-core timing is
representative. Ours is the single-launch batched device scan
(msm/eigen_device.py:implied_timescales_batched).

Both sides consume the same deterministic synthetic trace: a 1M-frame
1000-state Markovian wandering walk split into 28 ragged rows (the
Fs-peptide-style layout of BASELINE config 2).

    python reference_cpu_config2.py ref    # reference scan (CPU)
    python reference_cpu_config2.py ours   # our scan (current backend)

Each invocation prints one JSON line and merges it into
``reference-cpu-config2-result.json``.
"""

import json
import os
import sys
import time
from os.path import dirname, join

import numpy as np

sys.path.insert(0, dirname(dirname(__file__)))          # repo root
sys.path.insert(0, join(dirname(dirname(__file__)), 'tests'))

OUT = join(dirname(__file__), 'reference-cpu-config2-result.json')

N_FRAMES, N_STATES, N_ROWS = 1_000_000, 1000, 28
LAGS = list(range(10, 110, 10))
N_TIMES = 20


def _pin_cpu():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except ImportError:
        pass


def _synthetic_rows():
    """Deterministic 1000-state wandering walk with occasional jumps,
    split into 28 ragged rows."""
    rng = np.random.RandomState(0)
    steps = rng.choice([-1, 0, 1], size=N_FRAMES, p=[.3, .4, .3])
    jumps = rng.random(N_FRAMES) < 0.002
    steps[jumps] = rng.randint(-N_STATES, N_STATES, int(jumps.sum()))
    trace = (np.cumsum(steps) % N_STATES).astype(np.int32)
    splits = np.sort(rng.choice(np.arange(1, N_FRAMES), N_ROWS - 1,
                                replace=False))
    return np.split(trace, splits)


def stage_ref():
    _pin_cpu()
    from _reference_oracle import load_reference
    load_reference()
    from enspara import ra
    from enspara.msm import builders
    from enspara.msm.timescales import implied_timescales

    assigns = ra.RaggedArray(_synthetic_rows())
    t0 = time.perf_counter()
    its = implied_timescales(assigns, LAGS, method=builders.transpose,
                             n_times=N_TIMES, sliding_window=True,
                             trim=False)
    dt = time.perf_counter() - t0
    assert np.asarray(its).shape == (len(LAGS), N_TIMES)
    return {'ref_lag_scan_10x_top20_s': round(dt, 2)}


def stage_ours():
    import jax

    from enspara_tpu import ra
    from enspara_tpu.msm.eigen_device import implied_timescales_batched
    from enspara_tpu.util.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    assigns = ra.RaggedArray(_synthetic_rows())
    implied_timescales_batched(assigns, LAGS, n_times=N_TIMES)  # compile
    t0 = time.perf_counter()
    its = implied_timescales_batched(assigns, LAGS, n_times=N_TIMES)
    dt = time.perf_counter() - t0
    assert np.asarray(its).shape == (len(LAGS), N_TIMES)
    return {'ours_lag_scan_10x_top20_s': round(dt, 2),
            'ours_backend': jax.default_backend()}


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
