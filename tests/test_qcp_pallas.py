"""Fused Pallas QCP kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from enspara_tpu.ops import qcp
from enspara_tpu.ops.qcp_pallas import qcp_rmsd_matrix_pallas


def test_pallas_matches_xla_small():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(40, 30, 3)).astype(np.float32)
    centers = rng.normal(size=(12, 30, 3)).astype(np.float32)
    fc, gf = qcp.center_coordinates(frames)
    cc, gc = qcp.center_coordinates(centers)
    xla = np.asarray(qcp.qcp_rmsd_matrix(fc, cc, gf, gc))
    pal = np.asarray(qcp_rmsd_matrix_pallas(fc, cc, gf, gc,
                                            interpret=True))
    assert pal.shape == (40, 12)
    assert_allclose(pal, xla, atol=2e-3)


def test_pallas_padding_is_exact():
    """Atom / frame / center padding must not contaminate results."""
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(17, 23, 3)).astype(np.float32)
    centers = rng.normal(size=(5, 23, 3)).astype(np.float32)
    fc, gf = qcp.center_coordinates(frames)
    cc, gc = qcp.center_coordinates(centers)
    pal = np.asarray(qcp_rmsd_matrix_pallas(fc, cc, gf, gc,
                                            interpret=True))
    want = np.array([[qcp.kabsch_rmsd_np(np.asarray(fc)[i],
                                         np.asarray(cc)[j])
                      for j in range(5)] for i in range(17)])
    assert_allclose(pal, want, atol=2e-3)


def test_sharded_pallas_assignment_interpret():
    """The shard_map-wrapped Pallas assignment (interpret mode on the
    8-device CPU mesh) matches the XLA assignment path."""
    import jax
    from enspara_tpu.cluster import engine
    from enspara_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(2)
    X = rng.normal(size=(160, 20, 3)).astype(np.float32)
    centers = X[[0, 40, 80, 120]]
    mesh = pmesh.frame_mesh()

    data_sh, _ = engine.prepare_sharded(X, 'rmsd', mesh)
    centers_r = engine._center_structures(
        pmesh.replicated(centers.astype(np.float32), mesh))

    a_p, d_p = engine._assign_rmsd_pallas_sharded(
        data_sh, centers_r, 4, mesh)
    a_x, d_x = engine._assign_all(data_sh, centers_r, 'rmsd', k_real=4)

    np.testing.assert_array_equal(np.asarray(a_p), np.asarray(a_x))
    assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=2e-3)


def test_fused_kcenters_sharded_matches_single_device():
    """The SPMD fused loop (8-shard mesh, explicit collectives) finds
    the same centers/assignments as the 1-device fused loop."""
    import jax
    from enspara_tpu.cluster import engine
    from enspara_tpu.parallel.mesh import frame_mesh

    rng = np.random.default_rng(9)
    X = rng.normal(size=(600, 10, 3)).astype(np.float32)

    r1 = engine.kcenters_device_fused(X, n_clusters=9, tile=128,
                                      interpret=True)
    r8 = engine.kcenters_device_fused(X, n_clusters=9, tile=128,
                                      interpret=True,
                                      mesh=frame_mesh())
    assert len(jax.devices()) == 8

    np.testing.assert_array_equal(r1.center_indices, r8.center_indices)
    np.testing.assert_array_equal(r1.assignments, r8.assignments)
    assert_allclose(r8.distances, r1.distances, rtol=1e-4, atol=2e-3)


def test_fused_kcenters_matches_global_loop():
    """The fused Pallas k-centers (interpret mode) bit-matches the
    global-view XLA loop."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(3)
    X = rng.normal(size=(300, 10, 3)).astype(np.float32)

    ref = engine.kcenters_device(X, 'rmsd', n_clusters=8)
    fused = engine.kcenters_device_fused(X, n_clusters=8, tile=128,
                                         interpret=True)

    np.testing.assert_array_equal(ref.center_indices,
                                  fused.center_indices)
    np.testing.assert_array_equal(ref.assignments, fused.assignments)
    # near rmsd=0 the fp32 QCP noise floor dominates
    assert_allclose(fused.distances, ref.distances, rtol=1e-4,
                    atol=2e-3)


def test_megafused_kcenters_multichunk_and_cutoff():
    """The multi-iteration chunk kernel (G=64 centers per launch) must
    carry the argmax across chunk boundaries and stop mid-chunk on the
    distance cutoff exactly like the XLA loop."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(17)
    X = rng.normal(size=(640, 6, 3)).astype(np.float32)

    # k=70 spans two launches of the G=64 chunk kernel
    ref = engine.kcenters_device(X, 'rmsd', n_clusters=70)
    fused = engine.kcenters_device_fused(X, n_clusters=70, tile=128,
                                         interpret=True)
    np.testing.assert_array_equal(ref.center_indices,
                                  fused.center_indices)
    np.testing.assert_array_equal(ref.assignments, fused.assignments)
    assert_allclose(fused.distances, ref.distances, rtol=1e-4,
                    atol=2e-3)

    # cutoff stop lands mid-chunk: placed-center count must match
    cut = float(np.percentile(ref.distances, 90))
    ref_c = engine.kcenters_device(X, 'rmsd', dist_cutoff=cut,
                                   k_max=128)
    fus_c = engine.kcenters_device_fused(X, dist_cutoff=cut, k_max=128,
                                         tile=128, interpret=True)
    np.testing.assert_array_equal(ref_c.center_indices,
                                  fus_c.center_indices)
    np.testing.assert_array_equal(ref_c.assignments, fus_c.assignments)


def test_megafused_kcenters_warm_start():
    """Warm starts enter the chunk kernel with a nonzero center
    ordinal; assignments of new centers must continue the numbering."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(23)
    X = rng.normal(size=(512, 6, 3)).astype(np.float32)

    seed = engine.kcenters_device_fused(X, n_clusters=3, tile=128,
                                        interpret=True)
    ref = engine.kcenters_device(
        X, 'rmsd', n_clusters=9,
        init_distances=seed.distances, init_assignments=seed.assignments,
        n_init_centers=3, init_center_indices=seed.center_indices)
    warm = engine.kcenters_device_fused(
        X, n_clusters=9, tile=128, interpret=True,
        init_distances=seed.distances, init_assignments=seed.assignments,
        n_init_centers=3, init_center_indices=seed.center_indices)
    np.testing.assert_array_equal(ref.center_indices,
                                  warm.center_indices)
    np.testing.assert_array_equal(ref.assignments, warm.assignments)


def test_kcenters_bf16_streaming_mode():
    """precision='bf16' streams frames at half width; on well-separated
    clusters (gaps >> the ~4e-3 relative rounding) it recovers the same
    partition as fp32, with distances within the rounding budget. Odd
    atom counts exercise the 16-atom bf16 padding."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(31)
    A = 10                                   # A_pad: 16 (bf16), 16|8
    templates = rng.normal(size=(8, A, 3)).astype(np.float32) * 5.0
    X = (templates[np.arange(512) % 8]
         + 0.01 * rng.normal(size=(512, A, 3)).astype(np.float32))

    r32 = engine.kcenters_device_fused(X, n_clusters=8, tile=128,
                                       interpret=True)
    r16 = engine.kcenters_device_fused(X, n_clusters=8, tile=128,
                                       interpret=True, precision='bf16')

    assert r16.n_found == r32.n_found == 8
    # one center per blob in both: identical partition labels (center
    # MEMBER choice within a blob may legally differ under rounding)
    np.testing.assert_array_equal(r16.assignments, r32.assignments)
    assert_allclose(r16.distances, r32.distances, atol=0.15)

    # warm start through the public kcenters_device contract arg check
    with np.testing.assert_raises(ValueError):
        engine.kcenters_device(X, 'euclidean', n_clusters=4,
                               precision='bf16')


def test_prepared_frames_reuse():
    """prepare_rmsd_frames ingests once; clustering from the prepared
    layout matches clustering from raw coordinates, across warm starts
    and precisions."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(41)
    X = rng.normal(size=(384, 10, 3)).astype(np.float32)

    raw = engine.kcenters_device_fused(X, n_clusters=6, tile=128,
                                       interpret=True)
    prep = engine.prepare_rmsd_frames(X, tile=128)
    pre = engine.kcenters_device_fused(prep, n_clusters=6,
                                       interpret=True)
    np.testing.assert_array_equal(raw.center_indices, pre.center_indices)
    np.testing.assert_array_equal(raw.assignments, pre.assignments)

    # same prepared object serves a second, warm-started clustering
    warm = engine.kcenters_device_fused(
        prep, n_clusters=9, interpret=True,
        init_distances=pre.distances, init_assignments=pre.assignments,
        n_init_centers=6, init_center_indices=pre.center_indices)
    assert warm.n_found == 9

    # mismatched layout parameters are rejected
    with np.testing.assert_raises(ValueError):
        engine.kcenters_device_fused(prep, n_clusters=4, tile=256,
                                     interpret=True)
    with np.testing.assert_raises(ValueError):
        engine.kcenters_device_fused(prep, n_clusters=4,
                                     precision='bf16', interpret=True)


def test_prepared_bf16_frames_inherit_precision():
    """precision=None (the default) inherits the prep's precision, so
    bf16-prepared frames cluster without repeating precision='bf16' at
    every call; only an EXPLICIT mismatching request raises
    (ADVICE r4: the old symmetric check made the default indistinct
    from an explicit fp32 request)."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(51)
    templates = rng.normal(size=(4, 8, 3)).astype(np.float32) * 5.0
    X = (templates[np.arange(256) % 4]
         + 0.01 * rng.normal(size=(256, 8, 3)).astype(np.float32))

    prep16 = engine.prepare_rmsd_frames(X, tile=128, precision='bf16')
    res = engine.kcenters_device_fused(prep16, n_clusters=4,
                                       interpret=True)   # no precision
    assert res.n_found == 4
    # explicit matching request still works
    res2 = engine.kcenters_device_fused(prep16, n_clusters=4,
                                        precision='bf16', interpret=True)
    np.testing.assert_array_equal(res.assignments, res2.assignments)
    # explicit MISMATCHING request still raises
    with np.testing.assert_raises(ValueError):
        engine.kcenters_device_fused(prep16, n_clusters=4,
                                     precision='fp32', interpret=True)


@pytest.mark.parametrize('precision', ['fp32', 'bf16'])
def test_streamed_ingest_equals_monolithic(precision, monkeypatch):
    """The chunked overlapped ingest path produces exactly the same
    prepared layout (frames_r, g, padding conventions) as the
    monolithic path, including ragged final chunks and bf16 rounding
    (VERDICT r4 item 3)."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(77)
    A = 10
    n = 700                              # ragged vs the 256-frame chunk
    templates = rng.normal(size=(5, A, 3)).astype(np.float32) * 5.0
    X = (templates[np.arange(n) % 5]
         + 0.01 * rng.normal(size=(n, A, 3)).astype(np.float32))

    # shrink the stream chunk so the test exercises multiple chunks +
    # a ragged tail without 64 MB of data
    monkeypatch.setattr(engine, '_STREAM_CHUNK_BYTES',
                        256 * A * 3 * 4)

    mono = engine.prepare_rmsd_frames(X, tile=128, precision=precision,
                                      stream=False)
    strm = engine.prepare_rmsd_frames(X, tile=128, precision=precision)
    assert strm.n == mono.n and strm.n_atoms == mono.n_atoms
    fm, fs = np.asarray(mono.frames_r), np.asarray(strm.frames_r)
    # same maths in a different jit shape: the CPU backend's centering
    # reduce picks a different vectorization, so allow 1-ulp noise
    # (measured bit-identical on TPU); padding conventions are exact
    np.testing.assert_allclose(fm, fs, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(mono.g), np.asarray(strm.g),
                               rtol=2e-5, atol=0)
    np.testing.assert_array_equal(fm == 0.0, fs == 0.0)   # padding
    assert np.all(np.asarray(strm.g)[0, n:] == 1.0)

    # clustering from the streamed prep matches raw-coordinate runs on
    # well-separated blobs (gaps >> the reduction noise)
    res_raw = engine.kcenters_device_fused(X, n_clusters=5, tile=128,
                                           interpret=True,
                                           precision=precision)
    res_strm = engine.kcenters_device_fused(strm, n_clusters=5,
                                            interpret=True)
    np.testing.assert_array_equal(res_raw.assignments,
                                  res_strm.assignments)


def test_streamed_ingest_unaligned_chunk(monkeypatch):
    """Regression (r5 review): a stream chunk size that is NOT a tile
    multiple makes the final zero-padded chunk reach past n_pad, and
    dynamic_update_slice CLAMPS the start — silently shifting the tail
    backwards over real frames. The tail chunk must truncate to the
    remaining padded length instead."""
    from enspara_tpu.cluster import engine

    rng = np.random.default_rng(99)
    A, n = 10, 700
    X = rng.normal(size=(n, A, 3)).astype(np.float32) * 3.0

    # cf = 300 frames: offsets 0/300/600, last chunk would reach 900
    # past n_pad=768 (tile=128) without the truncation
    monkeypatch.setattr(engine, '_STREAM_CHUNK_BYTES', 300 * A * 3 * 4)
    mono = engine.prepare_rmsd_frames(X, tile=128, stream=False)
    strm = engine.prepare_rmsd_frames(X, tile=128)
    np.testing.assert_allclose(np.asarray(mono.frames_r),
                               np.asarray(strm.frames_r),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(mono.frames_r) == 0.0,
                                  np.asarray(strm.frames_r) == 0.0)
    np.testing.assert_allclose(np.asarray(mono.g), np.asarray(strm.g),
                               rtol=2e-5, atol=0)
