#!/usr/bin/env python
"""Clustering work-scaling curve on the virtual device mesh.

One physical chip cannot demonstrate multi-chip SPEEDUP, but it can
demonstrate the thing speedup is made of: that doubling the mesh
halves the per-device shard and the sharded program's per-device work
tracks the single-device cost of that smaller shard, with a bounded
collective overhead. This script measures exactly that, on the
8-virtual-device CPU mesh (the same harness the test suite uses):

  for mesh size m in 1, 2, 4, 8 over FIXED total frames N:
    - compile time (reported separately),
    - warm full-loop wall time (min of 3),
    - the single-device wall time at shard size N/m (the "pure
      compute" yardstick),
  plus the derived collective overhead = sharded_time -
  single_device_time_at_shard_size.

On real multi-chip hardware the m virtual devices become m chips and
the per-device times become the wall time; the collective terms ride
ICI instead of a shared memory bus, with XLA-overlapped latency.
(Reference MPI scaling story: docs/source/clustering.rst:54-58 —
qualitative only; no numbers published.)

Writes benchmarks/scaling-curve-result.json.
"""

import json
import os

import sys
import time

# force the virtual CPU mesh BEFORE any backend init; the env vars
# alone are not enough where a site hook freezes JAX_PLATFORMS, so
# also go through jax.config (same recipe as tests/conftest.py)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_FRAMES = 65_536
N_ATOMS = 32
N_CLUSTERS = 64


def main():
    import jax
    import numpy as np

    from enspara_tpu.cluster.engine import (kcenters_device,
                                            prepare_sharded)
    from enspara_tpu.parallel.mesh import Mesh, FRAME_AXIS

    rng = np.random.default_rng(7)
    frames = rng.normal(size=(N_FRAMES, N_ATOMS, 3)).astype(np.float32)
    frames += 0.4 * rng.normal(size=(N_FRAMES, 1, 1)) * frames[:1]

    devices = jax.devices()
    assert len(devices) >= 8, 'need 8 virtual devices'

    def timed_run(data_sh, mesh):
        t0 = time.perf_counter()
        res = kcenters_device(data_sh, metric='rmsd',
                              n_clusters=N_CLUSTERS,
                              k_max=N_CLUSTERS, mesh=mesh)
        np.asarray(res.assignments)
        return time.perf_counter() - t0, res

    rows = []
    oracle = None
    for m in (1, 2, 4, 8):
        mesh = Mesh(np.array(devices[:m]), (FRAME_AXIS,))

        # sharded run at FIXED total frames
        data_sh, _ = prepare_sharded(frames, 'rmsd', mesh)
        compile_s, res = timed_run(data_sh, mesh)   # includes compile
        warm = min(timed_run(data_sh, mesh)[0] for _ in range(3))
        if oracle is None:
            oracle = np.asarray(res.assignments)
        else:
            # sharding must not change the result
            assert (np.asarray(res.assignments) == oracle).all(), \
                'sharded result diverged at mesh size %d' % m

        # single-device run at the SHARD size: the pure-compute
        # yardstick the per-device work should track
        mesh1 = Mesh(np.array(devices[:1]), (FRAME_AXIS,))
        shard = frames[:N_FRAMES // m]
        data1, _ = prepare_sharded(shard, 'rmsd', mesh1)
        timed_run(data1, mesh1)                     # compile
        solo = min(timed_run(data1, mesh1)[0] for _ in range(3))

        rows.append({
            'mesh_devices': m,
            'frames_total': N_FRAMES,
            'frames_per_shard': N_FRAMES // m,
            'compile_plus_first_run_s': round(compile_s, 3),
            'sharded_warm_s': round(warm, 3),
            'single_device_at_shard_size_s': round(solo, 3),
            'collective_overhead_s': round(warm - solo, 3),
        })
        print('mesh=%d shard=%d sharded=%.3fs solo@shard=%.3fs'
              % (m, N_FRAMES // m, warm, solo), flush=True)

    result = {
        'backend': jax.default_backend(),
        'n_virtual_devices': len(devices),
        'jax_version': jax.__version__,
        'workload': 'kcenters rmsd, %d frames x %d atoms -> %d '
                    'clusters, fixed total frames' %
                    (N_FRAMES, N_ATOMS, N_CLUSTERS),
        'note': 'virtual mesh on one physical host: per-device '
                'compute cannot speed up wall time; the scaling '
                'evidence is frames_per_shard halving while '
                'single_device_at_shard_size_s tracks it and '
                'collective_overhead_s stays bounded; sharded '
                'assignments asserted identical to 1-device',
        'points': rows,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'scaling-curve-result.json')
    with open(out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
