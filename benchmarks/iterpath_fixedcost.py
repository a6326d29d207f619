#!/usr/bin/env python
"""Per-center fixed cost of the per-iteration k-centers path vs the
chunk megakernel, at the 8-way shard size (VERDICT r4 item 4).

The multi-chip loop must run the per-iteration kernel (each center is
a GLOBAL argmax agreed across shards, so iterations can't be chunked
locally), and in round 4 that path paid ~0.5-0.6 ms/center of fixed
cost (pallas launch + a separate XLA argmax pass over the distance
row + center gather) on top of the HBM stream — which dominates at
production shard sizes (1M / 8 chips = 125k frames/shard, ~0.12 ms of
stream). This probe measures ms/center for:

  - the chunk megakernel (the single-chip flagship; the floor)
  - the per-iteration path WITH the in-kernel argmax epilogue
  - the per-iteration path with the old separate XLA argmax (ablation)

at n=131072 (64 tiles of 2048), A=64, k=500, min-of-3 per section.

Success criterion: iteration-path ms/center within ~15% of the chunk
kernel's at this size.
"""

import functools
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

from enspara_tpu.cluster import engine
from enspara_tpu.cluster.engine import (_kcenters_loop_fused,
                                        _kcenters_loop_megafused,
                                        prepare_rmsd_frames)
from enspara_tpu.ops.qcp_update_pallas import kcenters_iteration_pallas

N, A, K = 131072, 64, 500


@functools.partial(jax.jit, static_argnames=('k_max', 'n_atoms_real',
                                             'tile'))
def _loop_old_argmax(frames_r, g, dist, assig, n_clusters, dist_cutoff,
                     k_max, n_atoms_real, tile):
    """Round-4 behavior: separate XLA argmax pass between kernels."""
    rows = frames_r.shape[0]
    a_pad = rows // 3
    ctr_inds = jnp.full((k_max,), -1, jnp.int32)
    gidx0 = jnp.argmax(dist[0]).astype(jnp.int32)
    md0 = dist[0, gidx0]

    def cond(state):
        i, d, a, c, gidx, md = state
        return (i < n_clusters) & (md > dist_cutoff)

    def step(state):
        i, d, a, c, gidx, md = state
        c = c.at[i].set(gidx)
        col = jax.lax.dynamic_slice(frames_r, (0, gidx), (rows, 1))
        cvec = col.reshape(3, a_pad).T
        gb = jax.lax.dynamic_slice(g, (0, gidx), (1, 1))
        cid = jnp.reshape(i, (1, 1)).astype(jnp.int32)
        d, a = kcenters_iteration_pallas(
            frames_r, g, d, a, cvec, gb, cid, n_atoms_real, tile=tile)
        gidx2 = jnp.argmax(d[0]).astype(jnp.int32)
        return (i + 1, d, a, c, gidx2, d[0, gidx2])

    init = (jnp.asarray(0, jnp.int32), dist, assig, ctr_inds, gidx0, md0)
    i, d, a, c, _, _ = jax.lax.while_loop(cond, step, init)
    return d, a, c, i


def main():
    assert jax.default_backend() == 'tpu', 'on-chip probe'
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(rng, (N, A, 3), jnp.float32)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    prep = prepare_rmsd_frames(frames)
    frames_r, g = prep.frames_r, prep.g
    n_pad = frames_r.shape[1]
    tile = prep.tile

    def init_state():
        dist = np.full((1, n_pad), np.inf, np.float32)
        assig = np.full((1, n_pad), -1, np.int32)
        dist[0, N:] = -np.inf
        return jnp.asarray(dist), jnp.asarray(assig)

    def run_mega():
        d0, a0 = init_state()
        out = _kcenters_loop_megafused(
            frames_r, g, d0, a0, np.int32(0), np.int32(K),
            np.float32(0.0), K, A, tile=tile)
        jax.block_until_ready(out)
        return out

    def run_iter_new():
        d0, a0 = init_state()
        out = _kcenters_loop_fused(
            frames_r, g, d0, a0, np.int32(0), np.int32(K),
            np.float32(0.0), K, A, tile=tile)
        jax.block_until_ready(out)
        return out

    def run_iter_old():
        d0, a0 = init_state()
        out = _loop_old_argmax(frames_r, g, d0, a0, np.int32(K),
                               np.float32(0.0), K, A, tile)
        jax.block_until_ready(out)
        return out

    sections = {}
    outs = {}
    for name, fn in (('chunk_megakernel', run_mega),
                     ('iteration_argmax_epilogue', run_iter_new),
                     ('iteration_separate_argmax', run_iter_old)):
        warm = fn()   # compile
        assert int(np.asarray(warm[3])) == K, name
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs[name] = fn()
            ts.append(time.perf_counter() - t0)
        assert int(np.asarray(outs[name][3])) == K, name
        sections[name] = {
            'times_s': [round(t, 4) for t in ts],
            'ms_per_center': round(min(ts) / K * 1e3, 4),
            'spread': round(max(ts) / min(ts), 3),
        }

    # all three must agree exactly (same floats, same tie-breaks)
    ref = outs['chunk_megakernel']
    for name in ('iteration_argmax_epilogue', 'iteration_separate_argmax'):
        d, a, c, nf = outs[name]
        np.testing.assert_array_equal(np.asarray(c),
                                      np.asarray(ref[2]))
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(ref[1]))
        sections[name]['identical_to_megakernel'] = True

    floor = sections['chunk_megakernel']['ms_per_center']
    new = sections['iteration_argmax_epilogue']['ms_per_center']
    result = {
        'probe': 'iterpath-fixedcost',
        'n': N, 'a': A, 'k': K,
        'sections': sections,
        'iteration_over_megakernel': round(new / floor, 3),
        'target': 'iteration path within 1.15x of the megakernel',
        'provenance': {
            'backend': jax.default_backend(),
            'devices': [str(d) for d in jax.devices()],
            'jax_version': jax.__version__,
            'timestamp': time.strftime('%Y-%m-%dT%H:%M:%S%z'),
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'iterpath-fixedcost-result.json')
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == '__main__':
    main()
