"""RaggedArray semantics tests — the de-facto spec, mirroring the behavior
contract established by the reference's test_ra.py (704 LoC)."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal, assert_allclose

from enspara_tpu import ra
from enspara_tpu.ra import RaggedArray
from enspara_tpu.exception import DataInvalid


def make_ra():
    src = [np.array(range(10)), np.array(range(20)), np.array(range(30))]
    return RaggedArray(array=src), src


def test_creation_from_rows():
    a, src = make_ra()
    assert_array_equal(a.lengths, [10, 20, 30])
    assert len(a) == 3
    assert_array_equal(a[0], src[0])
    assert_array_equal(a[1], src[1])
    assert_array_equal(a[2], src[2])
    assert_array_equal(a._data, np.concatenate(src))


def test_creation_from_flat_and_lengths():
    a = RaggedArray(array=np.arange(60), lengths=[10, 20, 30])
    assert_array_equal(a[1], np.arange(10, 30))
    assert a.dtype == np.arange(60).dtype


def test_creation_flat_single_row():
    a = RaggedArray(np.arange(7))
    assert len(a) == 1
    assert_array_equal(a[0], np.arange(7))


def test_bad_size():
    with pytest.raises(DataInvalid):
        RaggedArray(array=np.arange(10), lengths=[3, 3])


def test_shape_size():
    a = RaggedArray(array=np.arange(60), lengths=[10, 20, 30])
    assert a.shape == (3, None)
    assert a.size == 60
    b = RaggedArray(array=np.arange(60), lengths=[30, 30])
    assert b.shape == (2, 30)
    # 3D ragged
    c = RaggedArray([np.zeros((5, 3)), np.zeros((10, 3))])
    assert c.shape == (2, None, 3)


def test_starts():
    a = RaggedArray(array=np.arange(60), lengths=[10, 20, 30])
    assert_array_equal(a.starts, [0, 10, 30])


def test_int_and_negative_row():
    a, src = make_ra()
    assert_array_equal(a[-1], src[2])
    assert_array_equal(a[-2], src[1])


def test_row_slice_returns_ra():
    a, src = make_ra()
    b = a[1:]
    assert isinstance(b, RaggedArray)
    assert_array_equal(b.lengths, [20, 30])
    assert_array_equal(b[0], src[1])
    c = a[::2]
    assert_array_equal(c.lengths, [10, 30])


def test_row_list_indexing():
    a, src = make_ra()
    b = a[[0, 2]]
    assert_array_equal(b.lengths, [10, 30])
    assert_array_equal(b[1], src[2])
    c = a[np.array([2, 0])]
    assert_array_equal(c[0], src[2])


def test_tuple_indexing_scalar():
    a, src = make_ra()
    assert a[0, 5] == src[0][5]
    assert a[2, 29] == src[2][29]
    assert a[-1, -1] == src[2][-1]
    assert a[1, -3] == src[1][-3]


def test_tuple_indexing_arrays():
    a, src = make_ra()
    out = a[(np.array([0, 1, 2]), np.array([1, 2, 3]))]
    assert_array_equal(out, [src[0][1], src[1][2], src[2][3]])
    # broadcast ([0,1,2], 4)
    out = a[(np.array([0, 1, 2]), 4)]
    assert_array_equal(out, [4, 4, 4])


def test_tuple_out_of_range():
    a, _ = make_ra()
    with pytest.raises(IndexError):
        a[0, 15]


def test_column_slices():
    a, src = make_ra()
    b = a[:, ::2]
    assert_array_equal(b.lengths, [5, 10, 15])
    assert_array_equal(b[1], src[1][::2])
    c = a[:, 2:5]
    assert_array_equal(c.lengths, [3, 3, 3])
    assert_array_equal(c[2], src[2][2:5])
    # clamping: slice longer than shortest row
    d = a[:, :15]
    assert_array_equal(d.lengths, [10, 15, 15])
    # negative stop
    e = a[:, :-1]
    assert_array_equal(e.lengths, [9, 19, 29])
    assert_array_equal(e[0], src[0][:-1])


def test_row_int_col_slice():
    a, src = make_ra()
    assert_array_equal(a[1, 3:9], src[1][3:9])
    assert_array_equal(a[1, ::3], src[1][::3])


def test_row_list_col_slice():
    a, src = make_ra()
    b = a[[0, 2], 1:4]
    assert_array_equal(b.lengths, [3, 3])
    assert_array_equal(b[0], src[0][1:4])
    assert_array_equal(b[1], src[2][1:4])


def test_setting_scalar():
    a, _ = make_ra()
    a[0, 5] = 100
    assert a[0, 5] == 100
    a[(np.array([1, 2]), np.array([0, 0]))] = [-5, -6]
    assert a[1, 0] == -5
    assert a[2, 0] == -6


def test_setting_row():
    a, src = make_ra()
    a[0] = np.arange(10) * 2
    assert_array_equal(a[0], np.arange(10) * 2)
    # replacing with a different length reshapes the raggedness
    a[0] = np.arange(3)
    assert_array_equal(a.lengths, [3, 20, 30])
    assert_array_equal(a[1], src[1])


def test_setting_col_slice():
    a, src = make_ra()
    a[1, 2:5] = [0, 0, 0]
    assert_array_equal(a[1][2:5], [0, 0, 0])
    assert_array_equal(a[1][5:], src[1][5:])


def test_subragged_data_mapping():
    """Row views share memory with the flat _data buffer."""
    a, _ = make_ra()
    row = a[0]
    row[0] = 999
    assert a._data[0] == 999


def test_operators():
    a, src = make_ra()
    b = a + 1
    assert isinstance(b, RaggedArray)
    assert_array_equal(b[0], src[0] + 1)
    c = a * a
    assert_array_equal(c[1], src[1] ** 2)
    d = 2 * a
    assert_array_equal(d[2], src[2] * 2)
    e = a / 2
    assert_allclose(e[0], src[0] / 2)
    f = (a - a)
    assert f.all() == False  # noqa: E712
    assert (a == a).all()


def test_eq_and_bool_mask():
    a, src = make_ra()
    mask = a < 5
    assert isinstance(mask, RaggedArray)
    sub = a[mask]
    assert_array_equal(np.sort(sub), np.sort(
        np.concatenate(src)[np.concatenate(src) < 5]))


def test_bool_mask_setting():
    a, _ = make_ra()
    a[a < 5] = -1
    assert (a._data[a._data < 0] == -1).all()
    assert (a._data >= -1).all()


def test_invert_or_and():
    a = RaggedArray([np.array([True, False]),
                     np.array([False, False, True])])
    inv = ~a
    assert_array_equal(inv[0], [False, True])
    both = a | inv
    assert both.all()
    neither = a & inv
    assert not neither.any()


def test_where():
    a, _ = make_ra()
    mask = a == 3
    rows, cols = ra.where(mask)
    assert_array_equal(rows, [0, 1, 2])
    assert_array_equal(cols, [3, 3, 3])
    # ndarray pass-through
    rows2 = ra.where(np.array([0, 1, 1]))
    assert_array_equal(rows2[0], [1, 2])


def test_zeros_like():
    a, _ = make_ra()
    z = ra.zeros_like(a)
    assert isinstance(z, RaggedArray)
    assert_array_equal(z.lengths, a.lengths)
    assert not z.any()
    z2 = ra.zeros_like(np.arange(5))
    assert_array_equal(z2, np.zeros(5, dtype=int))


def test_append():
    a, src = make_ra()
    a.append([np.arange(5)])
    assert_array_equal(a.lengths, [10, 20, 30, 5])
    assert_array_equal(a[3], np.arange(5))
    empty = RaggedArray([])
    empty.append([np.arange(4), np.arange(2)])
    assert_array_equal(empty.lengths, [4, 2])


def test_iterator():
    a, src = make_ra()
    for got, want in zip(a, src):
        assert_array_equal(got, want)


def test_partition_list():
    out = ra.partition_list(np.arange(10), [3, 3, 4])
    assert_array_equal(out[0], [0, 1, 2])
    assert_array_equal(out[2], [6, 7, 8, 9])
    with pytest.raises(DataInvalid):
        ra.partition_list(np.arange(10), [3, 3])


def test_partition_indices():
    out = ra.partition_indices([0, 3, 5, 9], [3, 3, 4])
    assert out == [(0, 0), (1, 0), (1, 2), (2, 3)]


def test_disk_roundtrip(tmp_path):
    a, _ = make_ra()
    fn = str(tmp_path / 'ra.h5')
    ra.save(fn, a)
    b = ra.load(fn)
    assert isinstance(b, RaggedArray)
    assert_array_equal(a.lengths, b.lengths)
    assert_array_equal(a._data, b._data)


def test_disk_roundtrip_numpy(tmp_path):
    fn = str(tmp_path / 'np.h5')
    arr = np.random.rand(17, 3)
    ra.save(fn, arr)
    out = ra.load(fn)
    assert isinstance(out, np.ndarray)
    assert_allclose(arr, out)


def test_disk_roundtrip_stride(tmp_path):
    a, src = make_ra()
    fn = str(tmp_path / 'ra.h5')
    ra.save(fn, a)
    b = ra.load(fn, stride=2)
    assert_array_equal(b.lengths, [5, 10, 15])
    assert_array_equal(b[2], src[2][::2])


def test_load_specific_keys(tmp_path):
    import h5py
    fn = str(tmp_path / 'keys.h5')
    with h5py.File(fn, 'w') as f:
        f.create_dataset('xyz_1', data=np.arange(8))
        f.create_dataset('xyz_2', data=np.arange(4))
        f.create_dataset('other', data=np.arange(5))
    out = ra.load(fn, keys=['xyz_1', 'xyz_2'])
    assert_array_equal(out.lengths, [8, 4])
    single = ra.load(fn, keys=['other'])
    assert isinstance(single, np.ndarray)


def test_load_mismatched_inner_dims(tmp_path):
    import h5py
    fn = str(tmp_path / 'bad.h5')
    with h5py.File(fn, 'w') as f:
        f.create_dataset('a_1', data=np.zeros((5, 3)))
        f.create_dataset('a_2', data=np.zeros((5, 4)))
    with pytest.raises(DataInvalid):
        ra.load(fn, keys=['a_1', 'a_2'])


def test_3d_ragged_rows():
    rows = [np.random.rand(4, 3), np.random.rand(7, 3)]
    a = RaggedArray(rows)
    assert a.shape == (2, None, 3)
    assert_array_equal(a[1], rows[1])
    b = a[:, 1:3]
    assert_array_equal(b[0], rows[0][1:3])


def test_padded_views():
    a, src = make_ra()
    padded, mask = a.padded()
    assert padded.shape == (3, 30)
    assert mask.sum() == 60
    assert_array_equal(padded[0][:10], src[0])
    assert not mask[0, 10:].any()
    seg = a.segment_ids()
    assert_array_equal(np.bincount(seg), [10, 20, 30])


def test_padded_roundtrip():
    from enspara_tpu.ra.device import pad_ragged, unpad_ragged
    a, _ = make_ra()
    p, m = pad_ragged(a._data, a.lengths)
    flat = unpad_ragged(p, a.lengths)
    assert_array_equal(flat, a._data)
