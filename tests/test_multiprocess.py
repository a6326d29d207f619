"""Two-process ``jax.distributed`` smoke test — the analog of the
reference's ``mpirun -n 2 pytest -m mpi`` CI phase
(/root/reference/.github/workflows/ci.yml:61-73).

Spawns two coordinated CPU processes (gloo collectives) and asserts:
- ``initialize_distributed`` wires up a 2-process world,
- striped loaders (parallel/io.py ``_process_info`` path) give each
  process exactly its ``i % size`` stripe and nothing else,
- a cross-process collective over a global frame mesh reduces
  correctly,
- a clustering checkpoint written by process 0 loads identically on
  both processes after a global sync.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import sys
pid, port, datadir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

from enspara_tpu.parallel.mesh import initialize_distributed
initialize_distributed(coordinator_address='localhost:' + port,
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

import os
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from enspara_tpu import ra
from enspara_tpu.parallel import io as pio

# --- striped loaders: process i owns rows i % 2 -----------------------
assert pio.striped_range(5) == list(range(pid, 5, 2))

lengths, local = pio.load_h5_as_striped(os.path.join(datadir, 'ra.h5'))
rows = [np.arange(l, dtype=np.float32) + 10 * i
        for i, l in enumerate([3, 5, 2, 4])]
assert list(lengths) == [3, 5, 2, 4]
expect = np.concatenate([rows[i] for i in range(pid, 4, 2)])
assert np.array_equal(np.asarray(local, dtype=np.float32).ravel(),
                      expect), (pid, local)

npys = [os.path.join(datadir, 'arr%d.npy' % i) for i in range(3)]
gl, nl = pio.load_npy_as_striped(npys)
assert list(gl) == [2, 2, 2]
own = np.concatenate([np.load(npys[i]) for i in range(pid, 3, 2)])
assert np.allclose(np.asarray(nl).reshape(own.shape), own)

# --- cross-process collective over a global frame mesh ----------------
devs = np.array(jax.devices())
mesh = Mesh(devs, ('frames',))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('frames')),
    np.arange(2, dtype=np.float32) + 2 * pid, (4,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
val = float(np.asarray(total.addressable_shards[0].data))
assert val == 6.0, val

# --- checkpoint coordination: rank 0 writes, everyone reads -----------
from enspara_tpu.util.checkpoint import (
    save_clustering_checkpoint, load_clustering_checkpoint)
ckpt = os.path.join(datadir, 'ckpt')
if pid == 0:
    save_clustering_checkpoint(
        ckpt, np.arange(4.0), np.arange(4), np.array([0, 2]),
        metadata={'algorithm': 'kcenters'})
multihost_utils.sync_global_devices('ckpt written')
state = load_clustering_checkpoint(ckpt)
assert np.array_equal(state['center_indices'], [0, 2])
assert np.array_equal(np.asarray(state['assignments']).ravel(),
                      np.arange(4))

print('WORKER %d ALL_OK' % pid, flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    from enspara_tpu import ra

    rows = [np.arange(l, dtype=np.float32) + 10 * i
            for i, l in enumerate([3, 5, 2, 4])]
    ra.save(str(tmp_path / 'ra.h5'), ra.RaggedArray(rows))
    for i in range(3):
        np.save(str(tmp_path / ('arr%d.npy' % i)),
                np.arange(2, dtype=np.float32) + 100 * i)

    worker = tmp_path / 'worker.py'
    worker.write_text(WORKER)
    port = str(_free_port())

    env = dict(os.environ)
    env['PYTHONPATH'] = REPO_ROOT + os.pathsep + env.get('PYTHONPATH', '')
    # the worker pins its own platform/devices via jax.config
    env.pop('XLA_FLAGS', None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('worker %d timed out' % pid)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'worker %d failed:\n%s' % (pid, out)
        assert ('WORKER %d ALL_OK' % pid) in out, out
