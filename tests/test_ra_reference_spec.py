"""Case-by-case port of the reference RaggedArray spec
(/root/reference/enspara/test/test_ra.py:24-399, the de-facto RA
contract), covering the error contracts and exotic slice combinations
the fast fuzz oracle does not enumerate (VERDICT r4 item 7).

Every Test_RaggedArray case is represented here (the TestParallelLoad
/ TestConcatenateTrajs classes exercise mdtraj loading, covered by our
own io/load tests — see docs/parity-checklist.md for the mapping).
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from enspara_tpu import ra
from enspara_tpu.exception import DataInvalid


def assert_ra_equal(a, b):
    assert_array_equal(a.lengths, b.lengths)
    assert_array_equal(a._data, b._data)


def test_creation():                                 # ref :26
    a = ra.RaggedArray(array=np.arange(50), lengths=[25, 25])
    assert_array_equal(a.starts, [0, 25])

    a = ra.RaggedArray(array=[np.arange(10), np.arange(20)])
    assert len(a) == 2
    assert a.dtype == int
    assert_array_equal(a.lengths, [10, 20])
    assert_array_equal(a.starts, [0, 10])
    assert_array_equal(a._data,
                       np.concatenate([np.arange(10), np.arange(20)]))


def test_floats():                                   # ref :38
    a = ra.RaggedArray([[0.8, 1.0, 1.2], [1.1, 1.0, 0.9, 0.8]])
    assert len(a) == 2
    assert a.dtype == float
    assert_array_equal(a.lengths, [3, 4])
    assert_array_equal(a.starts, [0, 3])
    assert_array_equal(a._data, [0.8, 1.0, 1.2, 1.1, 1.0, 0.9, 0.8])


def test_shape_size():                               # ref :49
    a = ra.RaggedArray(array=np.arange(50), lengths=[25, 20, 5])
    assert a.shape == (3, None)
    assert a.size == 50
    assert a.dtype == int

    a_reg = ra.RaggedArray(
        [[[0, 0, 0], [1, 1, 1], [2, 2, 2]], [[4, 4, 4], [5, 5, 5]]])
    assert a_reg.shape == (2, None, 3)

    a_irreg = ra.RaggedArray(
        [[[0, 0, 0, 0], [1, 1], [2, 2, 2]], [[4, 4], [5, 5, 5, 5, 5]]])
    assert a_irreg.shape == (2, None, None)


def test_bad_size():                                 # ref :124
    with pytest.raises(DataInvalid):
        ra.RaggedArray(array=np.arange(50), lengths=[25, 20])


def test_indexing_error_contract():                  # ref :129
    src = np.arange(55)
    a = ra.RaggedArray(array=src, lengths=[25, 30])

    assert a[0, 0] == 0
    assert a[0, 5] == 5
    assert a[1, 0] == 25
    assert a[1, 9] == 34

    # out-of-row-bounds element access raises, in both signs
    with pytest.raises(IndexError):
        a[0, 25]
    with pytest.raises(IndexError):
        a[0, -26]
    with pytest.raises(IndexError):
        a[1, 30]
    with pytest.raises(IndexError):
        a[1, -31]

    assert a[0, 0] == a[0][0]
    assert a[1, 9] == a[1][9]
    assert a[0, -1] == a[0, 24]
    assert a[1, -2] == a[1, 28]

    assert_array_equal(a[0], src[0:25])
    assert_array_equal(a[1], src[25:])
    assert_array_equal(a[-1], a[1])
    assert_array_equal(a[-2], a[0])
    assert len(a[0]) == 25
    assert len(a[1]) == 30

    with pytest.raises(IndexError):
        a[2]
    with pytest.raises(IndexError):
        a[-3]

    # a column window that clips differently per row compares equal to
    # the ragged literal
    b = ra.RaggedArray([[23, 24], [48, 49, 50]])
    assert a[:, 23:26] == b


def test_iterator():                                 # ref :171
    src = [range(10), range(20), range(30)]
    a = ra.RaggedArray(array=src)
    assert_array_equal(np.concatenate([i for i in a]),
                       np.concatenate([np.array(i) for i in src]))


def test_numpy_compatibility():                      # ref :178
    src = [range(4), range(5), range(6)]
    a = ra.RaggedArray(array=src)

    for i in np.arange(3):                 # numpy integer row index
        assert_array_equal(a[i], src[i])

    new_rag = [[10, 11, 12, 13], [1, 2, 3, 4, 5],
               [11, 12, 13, 14, 15, 16]]
    for i in np.arange(3):                 # numpy integer row set
        a[i] = new_rag[i]
        assert_array_equal(a[i], new_rag[i])

    a = ra.RaggedArray(array=[range(4), range(5), range(6)])
    # a single column index keeps the row axis: one singleton per row
    assert_array_equal(a[:, 1], [[1], [1], [1]])
    assert_array_equal(a[:, np.arange(3)[1]], [[1], [1], [1]])

    a[:, np.arange(3)[1]] = [[90], [90], [70]]
    assert_array_equal(a[:, 1], [[90], [90], [70]])


def test_negative_slicing():                         # ref :200
    src = np.arange(20)
    a = ra.RaggedArray(array=src, lengths=[10, 5, 5])

    assert_array_equal(a[:, :-1].lengths, np.array([9, 4, 4]))
    assert_array_equal(a[:, :-2][0], np.arange(8))
    assert_array_equal(a[:, :-2][1], np.array([10, 11, 12]))

    assert_array_equal(
        (a[:, :-2] + 2)._data,
        np.array([2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 14, 17, 18, 19]))
    # in-place arithmetic on a ragged slice writes through to the
    # parent's flat data
    a[:, :-2] += 2
    assert_array_equal(
        a._data,
        np.array([2, 3, 4, 5, 6, 7, 8, 9, 8, 9, 12, 13, 14, 13, 14,
                  17, 18, 19, 18, 19]))


def test_slicing():                                  # ref :219
    src = np.arange(60)
    a = ra.RaggedArray(array=src, lengths=[10, 20, 30])

    assert_array_equal(a[:].flatten(), src)
    assert_array_equal(a[0:2].flatten(), src[0:30])
    assert_array_equal(a[1:].flatten(), src[10:])

    assert_array_equal(
        a[:, 0:5].flatten(),
        np.concatenate((src[0:5], src[10:15], src[30:35])))
    assert type(a[[0, 1]]) is type(a)
    assert type(a[0]) is type(src)
    assert type(a[[0]]) is type(a)

    assert_array_equal(a[0, 5:10], src[5:10])
    assert_array_equal(a[-1, 5:10], src[35:40])
    assert_array_equal(a[2, 10:15:2], src[40:45:2])   # strided
    assert_array_equal(a[0, ::-1], src[9::-1])        # negative step


def test_set_indexing():                             # ref :239
    src = np.arange(60)
    a = ra.RaggedArray(array=src, lengths=[10, 20, 30])

    a_sub = a[np.array([0, 2, -1])]        # negative fancy row index
    assert_array_equal(a_sub[0], src[0:10])
    assert_array_equal(a_sub[1], src[30:60])
    assert_array_equal(a_sub[2], src[30:60])

    assert_array_equal(a[(np.array([0, 1]), np.array([0, 1]))],
                       src[np.array([0, 11])])
    assert_array_equal(
        a[(np.array([2, -1, -1]), np.array([3, -1, 4]))],
        src[np.array([33, 59, 34])])


def test_subragged_data_mapping():                   # ref :258
    a = ra.RaggedArray(array=np.arange(60), lengths=[10, 20, 30])
    b = a[1]
    b[0] = -1
    assert a[1, 0] == -1                   # row views share the data


def test_bool_indexing_smoke():                      # ref :266
    a = ra.RaggedArray(array=[range(10), range(15), range(10)])
    b = (a < 5)
    assert np.asarray(a[b]).min() == 0


def test_setting():                                  # ref :274
    src = np.arange(50)

    a = ra.RaggedArray(array=src, lengths=[20, 30])
    a[1] = range(30)
    assert_array_equal(a[1], range(30))
    assert_array_equal(a[0], range(20))
    assert a[1, 0] == 0
    assert a[1, -1] == 29

    a = ra.RaggedArray(array=src, lengths=[20, 30])
    a[0, 2:5] = np.array([11, 12, 13])
    assert_array_equal(a[0, 2], 11)
    assert_array_equal(a[1], src[20:])
    assert_array_equal(a[0, 2:5], np.array([11, 12, 13]))

    # fancy (row, col) with negatives in both axes
    a = ra.RaggedArray(array=src, lengths=[20, 30])
    a[(np.array([1, 1, 0, -1]),
       np.array([0, 3, -1, 4]))] = np.array([-1, -2, -3, -4])
    assert a[1, 0] == -1
    assert a[1, 3] == -2
    assert a[0, -1] == -3
    assert a[-1, 4] == -4

    # fancy rows + scalar column
    a = ra.RaggedArray(array=src, lengths=[20, 30])
    a[np.array([0, -1]), 3] = np.array([-3, -2])
    assert a[0, 3] == -3
    assert a[-1, 3] == -2

    # scalar row + fancy columns
    a = ra.RaggedArray(array=src, lengths=[20, 30])
    a[0, np.array([1, 2, -1])] = np.array([-3, -2, -1])
    assert a[0, 1] == -3
    assert a[0, 2] == -2
    assert a[0, -1] == -1


def test_eq():                                       # ref :318
    src = [range(10), range(20), range(30)]
    a = ra.RaggedArray(array=src)
    b = ra.RaggedArray(array=src)

    assert (a == b).all()
    b[0, 0] = 10
    assert not (a == b)[0, 0]
    assert (a == b)[1, 0]
    assert (a != b)[0, 0]
    assert (a == b)[0, 1:].all()
    assert (a == b)[1:].all()
    assert (a[0] == range(10)).all()


def test_where():                                    # ref :335
    a = ra.RaggedArray(array=[range(10), range(20), range(30)])
    assert_array_equal(
        ra.where(a < 5),
        (np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2]),
         np.array([0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4])))
    assert_array_equal(ra.where(a < 0), np.array([[], []]))


def test_where_ndarray():                            # ref :348
    a = np.array([range(5), range(4, -1, -1)])
    assert_array_equal(ra.where(a == 4), [[0, 1], [4, 0]])


def test_invert():                                   # ref :356
    a = ra.RaggedArray([[True, False, True, False],
                        [False, True, False]])
    assert_ra_equal(~a, ra.RaggedArray([[False, True, False, True],
                                        [True, False, True]]))


def test_or():                                       # ref :364
    a = ra.RaggedArray([[True, False, True, False],
                        [False, True, False]])
    b = ra.RaggedArray([[False, False, True, True],
                        [True, False, True]])
    assert_ra_equal(a | b,
                    ra.RaggedArray([[True, False, True, True],
                                    [True, True, True]]))


def test_zeros_like():                               # ref :376
    a = ra.RaggedArray([[True, False, True, False],
                        [False, True, False]])
    b = ra.zeros_like(a)
    assert_array_equal(a.lengths, b.lengths)
    assert a.shape[0] == b.shape[0]
    assert (b == 0).all()
    assert type(b) is ra.RaggedArray

    a = np.linspace(10, 20)
    b = ra.zeros_like(a)                   # plain ndarray passthrough
    assert_array_equal(a.shape, b.shape)
    assert_array_equal(np.zeros_like(a), b)


def test_operator_not_implemented():                 # ref :393
    a = ra.RaggedArray([[True, False, True, False],
                        [False, True, False]])
    with pytest.raises(TypeError):
        a > 'asdfasdfasd'


def test_disk_roundtrips(tmp_path):                  # ref :64-:122
    src = np.arange(55)
    a = ra.RaggedArray(array=src, lengths=[25, 30])

    p = str(tmp_path / 'ra.h5')
    ra.save(p, a)
    assert_ra_equal(a, ra.load(p))
    assert_ra_equal(a[:, ::3], ra.load(p, stride=3))

    # plain ndarray roundtrip
    p2 = str(tmp_path / 'np.h5')
    arr = np.ones((5, 5))
    ra.save(p2, arr)
    assert_array_equal(arr, ra.load(p2))

    # per-key files incl. 2-D inner dims
    import h5py
    src2 = np.array([[0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
                     [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]]).T
    a2 = ra.RaggedArray(array=src2, lengths=[4, 6])
    p3 = str(tmp_path / 'keys.h5')
    with h5py.File(p3, 'w') as f:
        f.create_dataset('key0', data=a2[0])
        f.create_dataset('key1', data=a2[1])
    assert_ra_equal(a2, ra.load(p3, keys=['key0', 'key1']))

    a3 = ra.RaggedArray(array=src, lengths=[15, 10, 30])
    p4 = str(tmp_path / 'keys3.h5')
    with h5py.File(p4, 'w') as f:
        for k in range(3):
            f.create_dataset('key%d' % k, data=a3[k])
    assert_ra_equal(a3[1:], ra.load(p4, keys=['key1', 'key2'])[:])
