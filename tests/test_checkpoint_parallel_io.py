"""Checkpoint layer and striped-loader parity tests."""

import numpy as np
from numpy.testing import assert_array_equal, assert_allclose

from enspara_tpu import ra
from enspara_tpu.util.checkpoint import (save_clustering_checkpoint,
                                         load_clustering_checkpoint,
                                         resume_kcenters)
from enspara_tpu.parallel import io as pio
from enspara_tpu.cluster import kcenters


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / 'ckpt')
    d = np.random.rand(50)
    a = np.random.randint(0, 5, 50)
    c = np.array([3, 11, 29])
    save_clustering_checkpoint(path, d, a, c,
                               metadata={'metric': 'euclidean'})
    state = load_clustering_checkpoint(path)
    assert_allclose(state['distances'], d)
    assert_array_equal(state['assignments'], a)
    assert_array_equal(state['center_indices'], c)
    assert state['iteration'] == 3
    assert state['metadata']['metric'] == 'euclidean'


def test_resume_kcenters_matches_uninterrupted(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(120, 4)).astype(np.float32)

    full = kcenters(X, 'euclidean', n_clusters=8)

    # run halfway, checkpoint, then resume
    half = kcenters(X, 'euclidean', n_clusters=4)
    path = str(tmp_path / 'ckpt')
    save_clustering_checkpoint(path, half.distances, half.assignments,
                               half.center_indices)
    resumed = resume_kcenters(path, X, metric='euclidean',
                              n_clusters=8)

    assert_array_equal(resumed.center_indices, full.center_indices)
    assert_array_equal(resumed.assignments, full.assignments)
    assert_allclose(resumed.distances, full.distances, rtol=1e-6)


def test_load_h5_as_striped(tmp_path):
    rows = [np.arange(10.0), np.arange(6.0), np.arange(8.0)]
    fn = str(tmp_path / 'r.h5')
    ra.save(fn, ra.RaggedArray(rows))
    lengths, data = pio.load_h5_as_striped(fn)
    assert lengths == [10, 6, 8]
    assert_allclose(data, np.concatenate(rows))
    lengths2, data2 = pio.load_h5_as_striped(fn, stride=2)
    assert lengths2 == [5, 3, 4]


def test_load_npy_as_striped(tmp_path):
    files = []
    rows = []
    for i, n in enumerate((5, 7)):
        arr = np.random.rand(n, 3)
        fn = str(tmp_path / ('f%d.npy' % i))
        np.save(fn, arr)
        files.append(fn)
        rows.append(arr)
    lengths, data = pio.load_npy_as_striped(files)
    assert lengths == [5, 7]
    assert_allclose(data, np.concatenate(rows))
