#!/usr/bin/env python
"""Tile-granular triangle-inequality skipping: the ablation
(VERDICT r4 item 1).

Measures the skip-kernel (ops/kcenters_skip_pallas) against the
non-skip chunk megakernel at the flagship size (1M x 64 atoms x 1000
centers) on three data regimes, recording runtime (min-of-3),
per-iteration tile-skip fractions, and bit-identity:

  - ``iid``    — the bench.py synthesis: iid frames around one
    template (high-dimensional noise ball). Concentration of measure
    predicts ~zero skipping: every tile contains near-worst-case
    frames, so tile_max ~ md, never <= md/2.
  - ``walk``   — temporally correlated random walk (drift along one
    mode + noise ball). Tiles are trajectory segments but the noise
    shell still dominates distances.
  - ``basins`` — a metastable-state analog: 896 well-separated
    templates, Markov dwell sequence (mean dwell ~2048 frames, so
    tiles are mostly basin-pure), intra-basin noise 50x below the
    inter-basin separation. This is the regime Zhao et al. 2013
    target: while centers are still claiming new basins, md stays at
    the inter-basin scale and every tile inside an already-covered
    basin is provably inert — the skip bound (tile_max <= md/2) fires
    tile-wide.

The skip rule (see the kernel docstring) is exactly the strict-<
no-op region of the update, so assignments/distances/centers must be
IDENTICAL in every regime; the question is purely how often whole
tiles get to skip their frame-block DMA.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from enspara_tpu.util.compile_cache import enable_compilation_cache

enable_compilation_cache()

from enspara_tpu.cluster.engine import (
    _kcenters_loop_megafused, _kcenters_loop_megafused_skip,
    prepare_rmsd_frames)

N, A, K = 1_000_000, 64, 1000
N_BASINS = 896


@jax.jit
def synth_iid(key):
    kb, kd, kn = jax.random.split(key, 3)
    base = jax.random.normal(kb, (A, 3), jnp.float32)
    drift = jax.random.normal(kd, (N, 1, 1), jnp.float32)
    noise = jax.random.normal(kn, (N, A, 3), jnp.float32)
    fr = base[None] + 0.3 * drift * base[None] + 0.1 * noise
    return fr - jnp.mean(fr, axis=1, keepdims=True)


@jax.jit
def synth_walk(key):
    kb, kd, kn = jax.random.split(key, 3)
    base = jax.random.normal(kb, (A, 3), jnp.float32)
    steps = 0.02 * jax.random.normal(kd, (N, 1, 1), jnp.float32)
    drift = jnp.cumsum(steps, axis=0)
    noise = jax.random.normal(kn, (N, A, 3), jnp.float32)
    fr = base[None] * (1.0 + drift) + 0.1 * noise
    return fr - jnp.mean(fr, axis=1, keepdims=True)


@jax.jit
def synth_basins(key):
    kt, kc, kj, kn = jax.random.split(key, 4)
    templates = jax.random.normal(kt, (N_BASINS, A, 3), jnp.float32)
    # Markov dwell sequence: switch with p = 1/2048 per frame
    switch = jax.random.uniform(kj, (N,)) < (1.0 / 2048.0)
    seg = jnp.cumsum(switch.astype(jnp.int32))
    choice = jax.random.randint(kc, (N,), 0, N_BASINS)   # per segment
    basin = choice[seg]
    noise = jax.random.normal(kn, (N, A, 3), jnp.float32)
    fr = templates[basin] + 0.02 * noise
    return fr - jnp.mean(fr, axis=1, keepdims=True)


def main():
    assert jax.default_backend() == 'tpu', 'on-chip ablation'
    results = {}
    for regime, synth in (('iid', synth_iid), ('walk', synth_walk),
                          ('basins', synth_basins)):
        X = synth(jax.random.PRNGKey(17))
        X.block_until_ready()
        prep = prepare_rmsd_frames(X)
        del X
        fr, g = prep.frames_r, prep.g
        n_pad = fr.shape[1]
        n_tiles = n_pad // prep.tile

        def init():
            dist = np.full((1, n_pad), np.inf, np.float32)
            dist[0, N:] = -np.inf
            assig = np.full((1, n_pad), -1, np.int32)
            return jnp.asarray(dist), jnp.asarray(assig)

        def run(fn):
            d0, a0 = init()
            out = fn(fr, g, d0, a0, np.int32(0), np.int32(K),
                     np.float32(0.0), K, A, tile=prep.tile)
            jax.block_until_ready(out)
            return out

        entry = {'n': N, 'a': A, 'k': K, 'n_tiles': n_tiles}
        outs = {}
        for name, fn in (('mega', _kcenters_loop_megafused),
                         ('skip', _kcenters_loop_megafused_skip)):
            warm = run(fn)                      # compile
            assert int(np.asarray(warm[3])) == K
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs[name] = run(fn)
                ts.append(time.perf_counter() - t0)
            entry[name] = {
                'times_s': [round(t, 4) for t in ts],
                'best_s': round(min(ts), 4),
                'pairs_per_sec': round(N * K / min(ts), 1),
                'spread': round(max(ts) / min(ts), 3),
            }

        for i in range(3):
            np.testing.assert_array_equal(np.asarray(outs['mega'][i]),
                                          np.asarray(outs['skip'][i]))
        entry['bit_identical'] = True

        skc = np.asarray(outs['skip'][4]).astype(np.float64)
        frac = skc[skc >= 0] / n_tiles
        entry['skip_fraction'] = {
            'mean': round(float(frac.mean()), 4),
            'max': round(float(frac.max()), 4),
            'per_decile_of_run': [round(float(c.mean()), 4)
                                  for c in np.array_split(frac, 10)],
        }
        entry['speedup_skip_over_mega'] = round(
            entry['mega']['best_s'] / entry['skip']['best_s'], 4)
        results[regime] = entry
        print('# %s: mega %.3fs skip %.3fs (%.2fx), skip frac mean '
              '%.3f' % (regime, entry['mega']['best_s'],
                        entry['skip']['best_s'],
                        entry['speedup_skip_over_mega'],
                        entry['skip_fraction']['mean']),
              file=sys.stderr, flush=True)
        del fr, g, prep, outs

    record = {
        'probe': 'triskip-ablation',
        'regimes': results,
        'provenance': {
            'backend': jax.default_backend(),
            'devices': [str(d) for d in jax.devices()],
            'jax_version': jax.__version__,
            'timestamp': time.strftime('%Y-%m-%dT%H:%M:%S%z'),
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'triskip-ablation-result.json')
    with open(out_path, 'w') as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == '__main__':
    main()
