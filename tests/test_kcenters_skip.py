"""Triangle-inequality tile-skip kernel: bit-identity against the
non-skip chunk megakernel (interpret mode; the on-chip equivalence and
the skip-fraction/runtime ablation live in
benchmarks/triskip_ablation.py).

The skip rule (ops/kcenters_skip_pallas docstring) is exactly the
strict-< no-op region of the k-centers update, so distances,
assignments and center choices must be IDENTICAL on any input — the
only degree of freedom is which tile DMAs get elided.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from enspara_tpu.cluster.engine import (_kcenters_loop_megafused,
                                        _kcenters_loop_megafused_skip,
                                        kcenters_device_fused,
                                        prepare_rmsd_frames)


def _basin_data(rng, n, a, n_basins, noise=0.02, dwell=64):
    """Temporally ordered metastable-basin frames — the regime where
    tiles become provably inert once their basin is covered."""
    templates = rng.normal(size=(n_basins, a, 3)).astype(np.float32)
    seg = np.cumsum(rng.random(n) < 1.0 / dwell)
    basin = rng.integers(0, n_basins, size=seg.max() + 1)[seg]
    X = (templates[basin]
         + noise * rng.normal(size=(n, a, 3)).astype(np.float32))
    return X


def _run(fn, prep, n, k, cutoff=0.0, n_start=0, init=None, **kw):
    n_pad = prep.frames_r.shape[1]
    dist = np.full((1, n_pad), np.inf, np.float32)
    assig = np.full((1, n_pad), -1, np.int32)
    if init is not None:
        dist[0, :n], assig[0, :n] = init
    dist[0, n:] = -np.inf
    return fn(prep.frames_r, prep.g, jnp.asarray(dist),
              jnp.asarray(assig), np.int32(n_start), np.int32(k),
              np.float32(cutoff), k, prep.n_atoms, interpret=True,
              tile=prep.tile, **kw)


@pytest.mark.parametrize('precision', ['fp32', 'bf16'])
def test_skip_loop_bit_identical(precision):
    rng = np.random.default_rng(3)
    n, a, k = 1024, 10, 48
    X = _basin_data(rng, n, a, n_basins=40)
    prep = prepare_rmsd_frames(X, tile=128, precision=precision)

    ref = _run(_kcenters_loop_megafused, prep, n, k)
    out = _run(_kcenters_loop_megafused_skip, prep, n, k)
    assert int(out[3]) == int(ref[3]) == k
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ref[i]),
                                      np.asarray(out[i]))
    skc = np.asarray(out[4])
    assert (skc >= 0).all() and skc.sum() > 0, \
        'basin data must produce some tile skips'


def test_skip_loop_cutoff_and_warm_start():
    rng = np.random.default_rng(5)
    n, a = 768, 8
    X = _basin_data(rng, n, a, n_basins=12)
    prep = prepare_rmsd_frames(X, tile=128)

    # cutoff mode stops both loops at the same center count
    ref = _run(_kcenters_loop_megafused, prep, n, 64, cutoff=0.5)
    out = _run(_kcenters_loop_megafused_skip, prep, n, 64, cutoff=0.5)
    assert int(out[3]) == int(ref[3]) < 64
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ref[i]),
                                      np.asarray(out[i]))

    # warm start: resume both from the first run's state
    init = (np.asarray(ref[0])[0, :n], np.asarray(ref[1])[0, :n])
    k0 = int(ref[3])
    ref2 = _run(_kcenters_loop_megafused, prep, n, k0 + 8,
                n_start=k0, init=init)
    out2 = _run(_kcenters_loop_megafused_skip, prep, n, k0 + 8,
                n_start=k0, init=init)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ref2[i]),
                                      np.asarray(out2[i]))


def test_skip_loop_sustained_window():
    """Data with a sustained skip window (a tight ball plus one wildly
    spread tile that keeps md high while the ball tiles sit far below
    md/2): results identical, ball tiles skipped every iteration."""
    rng = np.random.default_rng(9)
    n, a, k = 2048, 8, 32
    base = rng.normal(size=(a, 3)).astype(np.float32)
    X = (base[None]
         + 0.001 * rng.normal(size=(n, a, 3)).astype(np.float32))
    # the last tile: far-away, widely spread frames — every new center
    # lands here and md stays large, so the ball tiles skip forever
    X[1920:] = 10.0 * rng.normal(size=(128, a, 3)).astype(np.float32)
    prep = prepare_rmsd_frames(X, tile=128)

    ref = _run(_kcenters_loop_megafused, prep, n, k)
    out = _run(_kcenters_loop_megafused_skip, prep, n, k)
    assert int(out[3]) == int(ref[3]) == k
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ref[i]),
                                      np.asarray(out[i]))
    skc = np.asarray(out[4])
    # after the first center the 15 ball tiles are provably inert
    assert skc[1:k].min() >= 10


def test_dispatch_uses_skip_kernel():
    """kcenters_device_fused's default single-chip tier is the
    tri-skip megakernel; end-to-end results match the plain loop on
    concentrated data (where skipping never fires)."""
    rng = np.random.default_rng(11)
    n, a, k = 1024, 16, 32
    X = rng.normal(size=(n, a, 3)).astype(np.float32)
    prep = prepare_rmsd_frames(X, tile=128)

    ref = _run(_kcenters_loop_megafused, prep, n, k)
    res = kcenters_device_fused(prep, n_clusters=k, interpret=True)
    assert res.n_found == k
    np.testing.assert_array_equal(
        np.asarray(ref[1])[0, :n].astype(np.int64), res.assignments)
    np.testing.assert_array_equal(
        np.asarray(ref[2])[:k].astype(np.int64), res.center_indices)


def test_sharded_tri_skip_matches_plain_sharded():
    """The sharded loop's per-iteration tile-skip kernel (global-md
    Gonzalez bound per shard) must match the plain sharded kernel
    bit-for-bit on basin data where skips actually fire, across the
    8-virtual-device mesh."""
    import jax
    from jax.sharding import Mesh
    from enspara_tpu.cluster import engine
    from enspara_tpu.parallel.mesh import FRAME_AXIS

    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(devs, (FRAME_AXIS,))

    rng = np.random.default_rng(21)
    n, a, k = 4096, 8, 48
    X = _basin_data(rng, n, a, n_basins=40, dwell=256)
    prep = prepare_rmsd_frames(X, tile=128, mesh=mesh)

    def run(tri_skip):
        n_pad = prep.frames_r.shape[1]
        dist = np.full((1, n_pad), np.inf, np.float32)
        dist[0, n:] = -np.inf
        assig = np.full((1, n_pad), -1, np.int32)
        from enspara_tpu.parallel.mesh import NamedSharding, P
        sh = NamedSharding(mesh, P(None, FRAME_AXIS))
        return engine._kcenters_loop_fused_sharded(
            prep.frames_r, prep.g,
            jax.device_put(np.asarray(dist), sh),
            jax.device_put(np.asarray(assig), sh),
            np.int32(0), np.int32(k), np.float32(0.0), k, a, mesh,
            True, prep.tile, tri_skip=tri_skip)

    d1, a1, c1, n1 = run(False)
    d2, a2, c2, n2 = run(True)
    assert int(np.asarray(n1)) == int(np.asarray(n2)) == k
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_locality_sort_roundtrip():
    """sort='locality' clusters a sorted layout but returns results in
    the caller's frame order: a valid covering (centers are members of
    their own clusters at ~zero distance, every frame's distance is to
    its assigned center), equivalent PARTITION to the unsorted run on
    well-separated blobs, and warm starts seeded in caller order."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(13)
    n, a, k = 1024, 8, 5
    templates = rng.normal(size=(k, a, 3)).astype(np.float32) * 5.0
    blob = rng.integers(0, k, size=n)               # SHUFFLED blobs
    X = (templates[blob]
         + 0.01 * rng.normal(size=(n, a, 3)).astype(np.float32))

    res_u = engine.kcenters_device_fused(X, n_clusters=k, tile=128,
                                         interpret=True)
    res_s = engine.kcenters_device_fused(X, n_clusters=k, tile=128,
                                         interpret=True,
                                         sort='locality')
    assert res_s.n_found == k
    # centers are their own cluster members at ~zero distance, in
    # CALLER frame coordinates
    for j, ci in enumerate(res_s.center_indices):
        assert res_s.assignments[ci] == j
        assert res_s.distances[ci] < 5e-3
    # same partition as the unsorted run (label mapping may differ)
    relabel = {}
    for u, s in zip(res_u.assignments, res_s.assignments):
        assert relabel.setdefault(u, s) == s, 'partitions differ'
    assert len(relabel) == k
    # distances agree through the relabeling (same blob geometry)
    np.testing.assert_allclose(res_u.distances, res_s.distances,
                               atol=0.05)

    # warm start in caller order continues cleanly
    prep = engine.prepare_rmsd_frames(X, tile=128, sort='locality')
    warm = engine.kcenters_device_fused(
        prep, n_clusters=k + 3, interpret=True,
        init_distances=res_s.distances,
        init_assignments=res_s.assignments,
        n_init_centers=k, init_center_indices=res_s.center_indices)
    assert warm.n_found == k + 3
    np.testing.assert_array_equal(warm.center_indices[:k],
                                  res_s.center_indices)

    # requesting sort against an unsorted prep is an error
    prep_u = engine.prepare_rmsd_frames(X, tile=128)
    with pytest.raises(ValueError):
        engine.kcenters_device_fused(prep_u, n_clusters=k,
                                     interpret=True, sort='locality')
