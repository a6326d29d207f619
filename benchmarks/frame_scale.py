#!/usr/bin/env python
"""Frame-axis scale points with the round-5 kernels.

Clusters n = 4M / 8M / 16M / 32M frames (64 atoms) to 1000 centers on
ONE v5e, exercising all three dispatch tiers exactly as
``kcenters_device_fused`` gates them:

  - n <= ~7.3M fp32 (or ~2x that in bf16): tri-skip chunk megakernel
    (12 B/frame of VMEM state)
  - up to ~10.9M fp32: plain chunk megakernel (8 B/frame)
  - beyond: per-iteration kernel with the argmax epilogue (state
    streams through HBM every iteration)

Timing is the loop itself with device-side state init and an 8-byte
materialization (the production kernel rate — fetching 2x128 MB of
results over this box's dev tunnel would otherwise dominate), min of
2. Large bf16 points are synthesized CHUNKWISE directly into the
prepared layout (a 32M-frame fp32 intermediate would not fit HBM).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from enspara_tpu.util.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from enspara_tpu.cluster import engine
from enspara_tpu.cluster.engine import (PreparedRMSDFrames,
                                        _fix_g_tail, _ingest_chunk,
                                        _kcenters_loop_fused,
                                        _kcenters_loop_megafused,
                                        _kcenters_loop_megafused_skip)

A, K = 64, 1000
TILE = 2048
CF = 262_144          # synth/ingest chunk (frames)


def synth_prep(n, precision):
    """Chunked on-device synthesis straight into the fused layout."""
    a_mult = 16 if precision == 'bf16' else 8
    a_pad = ((A + a_mult - 1) // a_mult) * a_mult
    n_pad = ((n + TILE - 1) // TILE) * TILE
    dtype = jnp.bfloat16 if precision == 'bf16' else jnp.float32
    frames_buf = jnp.zeros((3 * a_pad, n_pad), dtype)
    g_buf = jnp.ones((1, n_pad), jnp.float32)

    @jax.jit
    def synth_chunk(key):
        kb, kd, kn = jax.random.split(key, 3)
        base = jax.random.normal(kb, (A, 3), jnp.float32)
        drift = jax.random.normal(kd, (CF, 1, 1), jnp.float32)
        noise = jax.random.normal(kn, (CF, A, 3), jnp.float32)
        return base[None] + 0.3 * drift * base[None] + 0.1 * noise

    key = jax.random.PRNGKey(3)
    for off in range(0, n, CF):
        key, sub = jax.random.split(key)
        chunk = synth_chunk(sub)
        # dynamic_update_slice CLAMPS an out-of-bounds start — a chunk
        # reaching past n_pad would shift backwards and overwrite
        # earlier frames (r5 review finding); truncate the tail chunk
        cf_eff = min(CF, n_pad - off)
        if cf_eff < CF:
            chunk = chunk[:cf_eff]
        frames_buf, g_buf = _ingest_chunk(
            frames_buf, g_buf, chunk, jnp.int32(off), a_pad,
            precision)
    return PreparedRMSDFrames(frames_buf, _fix_g_tail(g_buf,
                                                      jnp.int32(n)),
                              n, A, TILE, 1, precision)


def run_point(n, precision):
    prep = synth_prep(n, precision)
    n_pad = prep.frames_r.shape[1]
    a_pad = prep.frames_r.shape[0] // 3
    vmem_frames = 16 * 3 * a_pad * TILE
    if n_pad * 12 + vmem_frames <= 96 << 20:
        loop, tier = _kcenters_loop_megafused_skip, 'tri-skip'
    elif n_pad * 8 + vmem_frames <= 96 << 20:
        loop, tier = _kcenters_loop_megafused, 'megakernel'
    else:
        loop, tier = _kcenters_loop_fused, 'per-iteration'

    @jax.jit
    def make_state():
        d0 = jnp.full((1, n_pad), jnp.inf, jnp.float32) \
            .at[0, n:].set(-jnp.inf)
        a0 = jnp.full((1, n_pad), -1, jnp.int32)
        return d0, a0

    def run():
        d0, a0 = make_state()
        out = loop(prep.frames_r, prep.g, d0, a0, np.int32(0),
                   np.int32(K), np.float32(0.0), K, A, tile=TILE)
        assert int(np.asarray(out[3])) == K       # 8-byte fetch
    run()                                         # compile
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    pt = {'n_frames': n, 'precision': precision, 'tier': tier,
          'times_s': [round(t, 2) for t in ts],
          'best_s': round(min(ts), 2),
          'pairs_per_sec': round(n * K / min(ts), 1),
          'resident_gb': round(
              prep.frames_r.size * prep.frames_r.dtype.itemsize / 2**30,
              2)}
    print('# n=%.0fM %s [%s]: %.2f s (%.0fM pairs/s)'
          % (n / 1e6, precision, tier, pt['best_s'],
             pt['pairs_per_sec'] / 1e6), file=sys.stderr, flush=True)
    del prep
    return pt


def main():
    assert jax.default_backend() == 'tpu'
    points = []
    for n, precision in ((4_000_000, 'fp32'), (8_000_000, 'fp32'),
                         (8_000_000, 'bf16'), (16_000_000, 'bf16'),
                         (32_000_000, 'bf16')):
        points.append(run_point(n, precision))
    rec = {'probe': 'frame-scale-r5', 'k': K, 'a': A,
           'points': points,
           'provenance': {'backend': jax.default_backend(),
                          'devices': [str(d) for d in jax.devices()],
                          'jax_version': jax.__version__,
                          'timestamp': time.strftime(
                              '%Y-%m-%dT%H:%M:%S%z')}}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'frame-scale-r5-result.json')
    with open(out, 'w') as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == '__main__':
    main()
