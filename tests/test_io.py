"""I/O subsystem tests: topology/selection, PDB, XTC codec, HDF5, DCD,
Trajectory ops, parallel concatenated loading.

Uses the reference repo's bundled test data (read-only) when present,
plus synthetic round-trips that are fully self-contained."""

import os
import tempfile

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from enspara_tpu import io
from enspara_tpu.io.topology import Topology
from enspara_tpu.util.load import (load_as_concatenated,
                                   sound_trajectory, concatenate_trjs)

REF_DATA = '/root/reference/enspara/test/data'
HAVE_REF = os.path.isdir(REF_DATA)


def make_topology(n_res=3):
    top = Topology()
    chain = top.add_chain('A')
    for i in range(n_res):
        res = top.add_residue('ALA', chain, i + 1)
        for name, elem in (('N', 'N'), ('CA', 'C'), ('C', 'C'),
                           ('O', 'O'), ('CB', 'C')):
            top.add_atom(name, elem, res)
    return top


def make_traj(n_frames=5, n_res=3, seed=0):
    top = make_topology(n_res)
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n_frames, top.n_atoms, 3)).astype(np.float32)
    return io.Trajectory(xyz, top)


def test_topology_basics():
    top = make_topology(4)
    assert top.n_atoms == 20
    assert top.n_residues == 4
    assert top.residue(0).name == 'ALA'
    assert top.atom(1).name == 'CA'
    assert top.atom(1).element == 'C'


def test_topology_select():
    top = make_topology(4)
    ca = top.select('name CA')
    assert len(ca) == 4
    assert all(top.atom(i).name == 'CA' for i in ca)
    bb = top.select('backbone')
    assert len(bb) == 16
    sc = top.select('sidechain')
    assert len(sc) == 4
    not_bb = top.select('not backbone')
    assert_array_equal(sc, not_bb)
    combo = top.select('name CA or name CB')
    assert len(combo) == 8
    r0 = top.select('resid 0')
    assert len(r0) == 5
    rng_sel = top.select('resid 0 to 1')
    assert len(rng_sel) == 10
    assert len(top.select('protein and not element H')) == 20


def test_topology_json_roundtrip():
    top = make_topology(3)
    top2 = Topology.from_json(top.to_json())
    assert top2 == top


def test_topology_subset():
    top = make_topology(3)
    sub = top.subset(top.select('name CA'))
    assert sub.n_atoms == 3
    assert sub.n_residues == 3
    assert all(a.name == 'CA' for a in sub.atoms)


def test_pdb_roundtrip(tmp_path):
    traj = make_traj(3)
    fn = str(tmp_path / 'out.pdb')
    io.write_pdb(fn, traj)
    back = io.load_pdb(fn)
    assert back.n_frames == 3
    assert back.n_atoms == traj.n_atoms
    assert back.top == traj.top
    # PDB has 3 decimal places in Angstroms -> 1e-4 nm
    assert_allclose(back.xyz, traj.xyz, atol=1e-4)


def test_xtc_roundtrip(tmp_path):
    traj = make_traj(7)
    fn = str(tmp_path / 'out.xtc')
    io.write_xtc(fn, traj)
    back = io.load_xtc(fn, top=traj.top)
    assert back.n_frames == 7
    assert_allclose(back.xyz, traj.xyz, atol=6e-4)
    assert_allclose(back.time, traj.time)
    strided = io.load_xtc(fn, top=traj.top, stride=2)
    assert strided.n_frames == 4
    assert_allclose(strided.xyz, back.xyz[::2])


def test_hdf5_roundtrip(tmp_path):
    traj = make_traj(4)
    fn = str(tmp_path / 'out.h5')
    io.write_hdf5(fn, traj)
    back = io.load_hdf5(fn)
    assert back.n_frames == 4
    assert_allclose(back.xyz, traj.xyz)
    assert back.top == traj.top


def test_dcd_roundtrip(tmp_path):
    traj = make_traj(4)
    fn = str(tmp_path / 'out.dcd')
    io.write_dcd(fn, traj)
    back = io.load_dcd(fn, top=traj.top)
    assert back.n_frames == 4
    assert_allclose(back.xyz, traj.xyz, atol=1e-6)


def test_dcd_triclinic_cell_roundtrip(tmp_path):
    from enspara_tpu.io.dcd import _vectors_from_cell
    traj = make_traj(3)
    vec = _vectors_from_cell(4.0, 5.0, 6.0, 80.0, 95.0, 110.0)
    traj.unitcell_vectors = np.repeat(vec[None], 3, axis=0)
    fn = str(tmp_path / 'tri.dcd')
    io.write_dcd(fn, traj)
    back = io.load_dcd(fn, top=traj.top)
    assert back.unitcell_vectors is not None
    assert_allclose(back.unitcell_vectors, traj.unitcell_vectors,
                    atol=1e-5)
    assert_allclose(back.xyz, traj.xyz, atol=1e-6)


def test_dcd_cell_cosine_convention(tmp_path):
    # X-PLOR/NAMD stores cos(angle) in the cell record; the reader
    # must disambiguate from CHARMM's degrees.
    import struct
    from enspara_tpu.io.dcd import _vectors_from_cell
    traj = make_traj(1)
    fn = str(tmp_path / 'cos.dcd')
    io.write_dcd(fn, traj)
    raw = bytearray(open(fn, 'rb').read())
    # flip the has-cell flag in the header record (4-byte record
    # length prefix + offset 44 within the record data)
    raw[4 + 44:4 + 48] = struct.pack('<i', 1)
    # splice a cosine-form cell record before the x coordinate record
    a, b, c = 40.0, 50.0, 60.0
    cosa, cosb, cosg = (np.cos(np.radians(x)) for x in (80., 95., 110.))
    cell = struct.pack('<6d', a, cosg, b, cosb, cosa, c)
    rec = struct.pack('<i', 48) + cell + struct.pack('<i', 48)
    # records: header, title, natoms, then frames
    off = 0
    for _ in range(3):
        (n,) = struct.unpack('<i', raw[off:off + 4])
        off += 8 + n
    raw = raw[:off] + rec + raw[off:]
    open(fn, 'wb').write(bytes(raw))
    back = io.load_dcd(fn, top=traj.top)
    expect = _vectors_from_cell(4.0, 5.0, 6.0, 80.0, 95.0, 110.0)
    assert_allclose(back.unitcell_vectors[0], expect, atol=1e-5)


def test_trajectory_ops():
    traj = make_traj(10)
    assert len(traj) == 10
    assert traj[0].n_frames == 1
    assert traj[2:8].n_frames == 6
    assert traj[::2].n_frames == 5
    j = traj[:5].join(traj[5:])
    assert_allclose(j.xyz, traj.xyz)
    sliced = traj.atom_slice([0, 1, 2])
    assert sliced.n_atoms == 3
    assert sliced.top.n_atoms == 3
    centered = traj.copy().center_coordinates()
    assert_allclose(centered.xyz.mean(axis=1), 0, atol=1e-5)


def test_superpose_removes_rigid_motion():
    traj = make_traj(1)
    base = traj.xyz[0].astype(np.float64)
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]])
    moved = io.Trajectory(
        (base @ R.T + np.array([1., 2., 3.]))[None].astype(np.float32),
        traj.top)
    moved.superpose(traj)
    assert_allclose(moved.xyz[0], base, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_load_reference_xtc_against_h5():
    h5 = io.load(os.path.join(REF_DATA, 'frame0.h5'))
    xtc = io.load(os.path.join(REF_DATA, 'frame0.xtc'),
                  top=h5.topology)
    assert xtc.n_frames == h5.n_frames == 501
    assert xtc.n_atoms == h5.n_atoms == 22
    # xtc quantizes at 1/1000 nm
    assert_allclose(xtc.xyz, h5.xyz, atol=1.01e-3)
    assert_allclose(xtc.time, h5.time, atol=1e-4)


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_load_reference_pdb():
    pdb = io.load(os.path.join(REF_DATA, 'native.pdb'))
    assert pdb.n_frames == 1
    assert pdb.n_atoms == 22
    assert pdb.top.n_residues == 3  # ACE-ALA-NME
    # only the ALA residue has a CA atom
    ca = pdb.top.select('name CA')
    assert len(ca) == 1


def test_load_as_concatenated(tmp_path):
    trajs = [make_traj(n, seed=n) for n in (4, 6, 5)]
    files = []
    for i, t in enumerate(trajs):
        fn = str(tmp_path / ('t%d.xtc' % i))
        io.write_xtc(fn, t)
        files.append(fn)
    lengths, xyz = load_as_concatenated(files, top=trajs[0].top)
    assert lengths == [4, 6, 5]
    assert xyz.shape == (15, trajs[0].n_atoms, 3)
    assert_allclose(xyz[:4], trajs[0].xyz, atol=6e-4)
    assert_allclose(xyz[10:], trajs[2].xyz, atol=6e-4)


def test_sound_trajectory(tmp_path):
    t = make_traj(9)
    fn = str(tmp_path / 's.xtc')
    io.write_xtc(fn, t)
    assert sound_trajectory(fn) == 9
    assert sound_trajectory(fn, stride=2) == 5


def test_concatenate_trjs():
    trajs = [make_traj(3, seed=i) for i in range(2)]
    out = concatenate_trjs(trajs)
    assert out.n_frames == 6
    ca_only = concatenate_trjs(trajs, atoms='name CA')
    assert ca_only.n_atoms == 3


def test_topology_select_compound_expressions():
    top = make_topology(6)
    # parentheses + nested boolean logic
    sel = top.select('(name CA or name CB) and resid 0 to 2')
    assert len(sel) == 6
    sel2 = top.select('not (name CA or name CB)')
    assert len(sel2) == top.n_atoms - 12
    sel3 = top.select('resSeq 1 and name N')
    assert len(sel3) == 1
    assert top.atom(int(sel3[0])).name == 'N'


def test_trajectory_stack():
    a = make_traj(3, n_res=2, seed=1)
    b = make_traj(3, n_res=1, seed=2)
    s = a.stack(b)
    assert s.n_atoms == a.n_atoms + b.n_atoms
    assert s.top.n_residues == 3
    assert_allclose(s.xyz[:, :a.n_atoms], a.xyz)
    assert_allclose(s.xyz[:, a.n_atoms:], b.xyz)


def test_xtc_single_frame_and_time(tmp_path):
    t = make_traj(1)
    fn = str(tmp_path / 'one.xtc')
    io.write_xtc(fn, t)
    back = io.load(fn, top=t.top)
    assert back.n_frames == 1
    frame5 = io.load_frame(fn, 0, top=t.top)
    assert frame5.n_frames == 1


def test_xtc_fuzz_roundtrip(tmp_path):
    """Property-style roundtrips of the C++ XTC codec: odd atom
    counts, extreme magnitudes, tight clusters (small-delta runs), and
    single/large frame counts all survive within the quantization."""
    rng = np.random.default_rng(11)
    cases = [
        (1, 7, 1.0),            # single frame, odd atoms
        (13, 3, 100.0),         # large coordinates
        (5, 129, 0.001),        # tiny spread -> long small-delta runs
        (64, 31, 5.0),
    ]
    for i, (F, A, scale) in enumerate(cases):
        top = make_topology(max(1, A // 5 + 1))
        n_atoms = top.n_atoms
        xyz = (rng.normal(size=(F, n_atoms, 3)) * scale) \
            .astype(np.float32)
        traj = io.Trajectory(xyz, top)
        fn = str(tmp_path / ('fuzz%d.xtc' % i))
        io.write_xtc(fn, traj)
        back = io.load_xtc(fn, top=top)
        assert back.n_frames == F
        # xtc quantizes at 1/precision (default 1000/nm)
        tol = max(6e-4, 6e-4 * scale / 1.0) if scale > 1 else 6e-4
        assert_allclose(back.xyz, xyz, atol=tol)


def test_load_as_concatenated_generator_and_frame(tmp_path):
    """Generator filename input and per-file frame kwarg (reference:
    test_ra.py test_load_as_concatenated_generator / _frame_kwarg)."""
    trajs = [make_traj(n, seed=n) for n in (4, 6)]
    files = []
    for i, t in enumerate(trajs):
        fn = str(tmp_path / ('g%d.xtc' % i))
        io.write_xtc(fn, t)
        files.append(fn)

    # generator input
    lengths, xyz = load_as_concatenated(
        (f for f in files), top=trajs[0].top)
    assert lengths == [4, 6]

    # per-file args with frame selection
    lengths, xyz = load_as_concatenated(
        files, args=[{'top': trajs[0].top, 'frame': 1},
                     {'top': trajs[1].top, 'frame': 3}])
    assert lengths == [1, 1]
    assert_allclose(xyz[0], trajs[0].xyz[1], atol=6e-4)
    assert_allclose(xyz[1], trajs[1].xyz[3], atol=6e-4)


def test_load_as_concatenated_args_kwargs_conflict(tmp_path):
    from enspara_tpu.exception import ImproperlyConfigured

    t = make_traj(3)
    fn = str(tmp_path / 'x.xtc')
    io.write_xtc(fn, t)
    with pytest.raises(ImproperlyConfigured):
        load_as_concatenated([fn], args=[{'top': t.top}], top=t.top)


# ---------------------------------------------------------------------
# TRR / AMBER NetCDF / GRO formats
# ---------------------------------------------------------------------

def test_trr_roundtrip(tmp_path):
    t = make_traj(4)
    t.unitcell_vectors = np.tile(np.eye(3, dtype=np.float32) * 2.5,
                                 (4, 1, 1))
    fn = str(tmp_path / 'x.trr')
    io.write_trr(fn, t)
    back = io.load(fn, top=t.top)
    assert_allclose(back.xyz, t.xyz, atol=1e-6)
    assert_allclose(back.unitcell_vectors, t.unitcell_vectors,
                    atol=1e-6)
    assert_allclose(back.time, t.time, atol=1e-6)

    strided = io.load(fn, top=t.top, stride=2)
    assert_allclose(strided.xyz, t.xyz[::2], atol=1e-6)
    one = io.load(fn, top=t.top, frame=3)
    assert_allclose(one.xyz[0], t.xyz[3], atol=1e-6)
    sub = io.load(fn, top=t.top, atom_indices=[0, 2, 5])
    assert_allclose(sub.xyz, t.xyz[:, [0, 2, 5]], atol=1e-6)
    assert sub.top.n_atoms == 3


def test_trr_header_bytes(tmp_path):
    """The on-disk frame header must match the GROMACS xdrfile layout
    byte for byte (magic, 13, 12, tag, 13 big-endian ints)."""
    import struct

    t = make_traj(1)
    fn = str(tmp_path / 'x.trr')
    io.write_trr(fn, t)
    raw = open(fn, 'rb').read()
    magic, slen, blen = struct.unpack('>3i', raw[:12])
    assert (magic, slen, blen) == (1993, 13, 12)
    assert raw[12:24] == b'GMX_trn_file'
    ints = struct.unpack('>13i', raw[24:76])
    assert ints[7] == 12 * t.top.n_atoms        # x_size
    assert ints[10] == t.top.n_atoms            # natoms


def test_trr_double_precision_read(tmp_path):
    """Double-precision TRR (box_size = 72) reads correctly — the
    float width is inferred per frame as GROMACS does."""
    import struct

    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(2, 7, 3))
    box = np.eye(3) * 3.0
    fn = str(tmp_path / 'double.trr')
    with open(fn, 'wb') as f:
        for i in range(2):
            f.write(struct.pack('>3i', 1993, 13, 12))
            f.write(b'GMX_trn_file')
            f.write(struct.pack('>13i', 0, 0, 72, 0, 0, 0, 0,
                                8 * 21, 0, 0, 7, i, 0))
            f.write(struct.pack('>2d', float(i), 0.0))
            f.write(box.astype('>f8').tobytes())
            f.write(xyz[i].astype('>f8').tobytes())
    back = io.load(fn)
    assert_allclose(back.xyz, xyz, atol=1e-6)
    assert_allclose(back.unitcell_vectors[0], box, atol=1e-6)


def test_netcdf_roundtrip(tmp_path):
    t = make_traj(3)
    t.unitcell_vectors = np.tile(np.eye(3, dtype=np.float32) * 4.0,
                                 (3, 1, 1))
    fn = str(tmp_path / 'x.nc')
    io.write_netcdf(fn, t)
    back = io.load(fn, top=t.top)
    assert_allclose(back.xyz, t.xyz, atol=1e-5)
    assert_allclose(back.unitcell_vectors, t.unitcell_vectors,
                    atol=1e-5)
    assert_allclose(back.time, t.time, atol=1e-6)


def test_netcdf_amber_convention(tmp_path):
    """A file written independently with scipy following the AMBER
    convention (angstrom on disk) loads with nm coordinates."""
    from scipy.io import netcdf_file

    rng = np.random.default_rng(1)
    coords_A = rng.uniform(0, 30, size=(2, 5, 3)).astype(np.float32)
    fn = str(tmp_path / 'amber.nc')
    with netcdf_file(fn, 'w', version=2) as nc:
        nc.Conventions = b'AMBER'
        nc.createDimension('frame', None)
        nc.createDimension('atom', 5)
        nc.createDimension('spatial', 3)
        v = nc.createVariable('coordinates', 'f',
                              ('frame', 'atom', 'spatial'))
        v[:] = coords_A
        v.units = b'angstrom'
    back = io.load(fn)
    assert_allclose(back.xyz, coords_A / 10.0, atol=1e-6)


def test_gro_golden_and_roundtrip(tmp_path):
    """Fixed-column GRO sample (GROMACS manual layout) parses into
    coordinates, topology, box, and time."""
    text = (
        'MD of 2 waters, t= 4.2\n'
        '    6\n'
        '    1WATER  OW1    1   0.126   1.624   1.679\n'
        '    1WATER  HW2    2   0.190   1.661   1.747\n'
        '    1WATER  HW3    3   0.177   1.568   1.613\n'
        '    2WATER  OW1    4   1.275   0.053   0.622\n'
        '    2WATER  HW2    5   1.337   0.011   0.710\n'
        '    2WATER  HW3    6   1.326   0.120   0.568\n'
        '   1.82060   1.82060   1.82060\n')
    fn = str(tmp_path / 'w.gro')
    open(fn, 'w').write(text)
    t = io.load(fn)
    assert t.n_frames == 1
    assert t.top.n_atoms == 6
    assert t.top.n_residues == 2
    assert t.top.residue(0).name == 'WATER'
    assert t.top.atom(0).name == 'OW1'
    assert_allclose(t.xyz[0, 0], [0.126, 1.624, 1.679], atol=1e-6)
    assert_allclose(t.unitcell_vectors[0],
                    np.eye(3) * 1.8206, atol=1e-4)
    assert_allclose(t.time, [4.2], atol=1e-6)

    # roundtrip with a generated topology, multiple frames
    t2 = make_traj(3)
    fn2 = str(tmp_path / 'x.gro')
    io.write_gro(fn2, t2)
    back = io.load(fn2)
    assert back.n_frames == 3
    assert_allclose(back.xyz, t2.xyz, atol=5e-4)     # %8.3f quantizes
    assert back.top.n_atoms == t2.top.n_atoms
    assert [a.name for a in back.top.atoms] == \
        [a.name for a in t2.top.atoms]

    # a .gro works as the top= argument for other formats
    fn3 = str(tmp_path / 'x.xtc')
    io.write_xtc(fn3, t2)
    viagro = io.load(fn3, top=fn2)
    assert viagro.top.n_atoms == t2.top.n_atoms


def test_xtc_roundtrip_iid_coordinates_boundary_deltas():
    """Regression: the water-trick swap emits the NEGATED next-vs-cur
    delta; a delta of exactly -smallnum negated to +smallnum, which
    overflowed the asymmetric small field and corrupted the whole run
    by one full field width (4096 quanta). iid coordinates hit the
    boundary reliably where smooth MD-like data never did."""
    from enspara_tpu import io
    from enspara_tpu.io import Topology, Trajectory

    rng = np.random.RandomState(0)
    xyz = (rng.normal(size=(2000, 256, 3)) * 0.5 + 2).astype(np.float32)
    top = Topology()
    chain = top.add_chain()
    res = top.add_residue('ALA', chain, 1)
    for _ in range(256):
        top.add_atom('C', 'C', res)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'rt.xtc')
        io.write_xtc(p, Trajectory(xyz, top))
        back = np.asarray(io.load_xtc(p, top=top).xyz)
    err = np.abs(back - xyz).max()
    assert err < 2e-3, 'lossy xtc quantum exceeded: %g' % err


@pytest.mark.parametrize('fmt,writer,loader,lossy', [
    ('xtc', 'write_xtc', 'load_xtc', True),
    ('trr', 'write_trr', 'load_trr', False),
    ('dcd', 'write_dcd', 'load_dcd', False),
    ('h5', 'write_hdf5', 'load_hdf5', False),
    ('nc', 'write_netcdf', 'load_netcdf', False),
])
def test_format_roundtrip_iid_fuzz(fmt, writer, loader, lossy):
    """Every codec must round-trip adversarial (iid, boundary-heavy)
    coordinates — smooth MD-like fixtures miss encoder edge cases (see
    the XTC small-delta boundary regression above)."""
    from enspara_tpu import io
    from enspara_tpu.io import Topology, Trajectory

    rng = np.random.RandomState(sum(map(ord, fmt)))
    xyz = np.concatenate([
        (rng.normal(size=(40, 64, 3)) * 0.5 + 2),
        rng.randint(-4096, 4097, size=(10, 64, 3)) / 1000.0,
    ]).astype(np.float32)
    top = Topology()
    chain = top.add_chain()
    res = top.add_residue('ALA', chain, 1)
    for _ in range(64):
        top.add_atom('C', 'C', res)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'rt.' + fmt)
        getattr(io, writer)(p, Trajectory(xyz, top))
        back = getattr(io, loader)(p, top=top)
        bx = np.asarray(back.xyz if hasattr(back, 'xyz') else back)
    assert bx.shape == xyz.shape
    tol = 2e-3 if lossy else 1e-5
    err = np.abs(bx - xyz).max()
    assert err < tol, '%s roundtrip err %g' % (fmt, err)


# --- round-5 review fixes -------------------------------------------

def test_loaders_resolve_top_path(tmp_path):
    """load_xtc/load_dcd/load_hdf5 accept a PDB path or Trajectory as
    top, like the rest of the package (review: they stored the raw
    string/Trajectory as topology)."""
    from enspara_tpu import io as io_mod
    from enspara_tpu.io.dcd import write_dcd, load_dcd
    from enspara_tpu.io.hdf5 import load_hdf5

    traj = make_traj()
    pdb = str(tmp_path / 'top.pdb')
    traj[0].save(pdb)
    dcd = str(tmp_path / 't.dcd')
    write_dcd(dcd, traj)
    for top in (pdb, traj):
        out = load_dcd(dcd, top=top)
        assert out.topology.n_atoms == traj.n_atoms
        assert out.topology.atom(0).name == traj.topology.atom(0).name

    h5 = str(tmp_path / 't.h5')
    traj.save(h5)
    out = load_hdf5(h5, top=pdb)
    assert out.topology.n_atoms == traj.n_atoms


def test_truncated_dcd_recovers_complete_frames(tmp_path):
    """A tail-truncated DCD (simulation killed mid-write) yields the
    complete frames instead of crashing (review finding)."""
    from enspara_tpu.io.dcd import write_dcd, load_dcd, scan_dcd

    traj = make_traj()
    dcd = str(tmp_path / 't.dcd')
    write_dcd(dcd, traj)
    full = load_dcd(dcd)
    data = open(dcd, 'rb').read()
    cut = str(tmp_path / 'cut.dcd')
    open(cut, 'wb').write(data[:-30])     # clip into the last record
    part = load_dcd(cut)
    assert part.n_frames == full.n_frames - 1
    np.testing.assert_array_equal(part.xyz, full.xyz[:-1])
    nf, na = scan_dcd(cut)
    assert (nf, na) == (full.n_frames - 1, full.n_atoms)


def test_scan_helpers_match_loads(tmp_path):
    from enspara_tpu.io.dcd import write_dcd, scan_dcd
    from enspara_tpu.io.trr import write_trr, scan_trr
    from enspara_tpu.util.load import sound_trajectory

    traj = make_traj()
    dcd = str(tmp_path / 't.dcd')
    trr = str(tmp_path / 't.trr')
    write_dcd(dcd, traj)
    write_trr(trr, traj)
    assert scan_dcd(dcd) == (traj.n_frames, traj.n_atoms)
    assert scan_trr(trr) == (traj.n_frames, traj.n_atoms)
    assert sound_trajectory(dcd) == traj.n_frames
    assert sound_trajectory(trr, stride=2) == -(-traj.n_frames // 2)


def test_guess_element_calcium_vs_alpha_carbon():
    from enspara_tpu.io.topology import guess_element

    assert guess_element('CA', 'ALA') == 'C'      # alpha carbon
    assert guess_element('CA', 'LIG') == 'C'      # ligand carbon
    assert guess_element('CA', 'CA') == 'Ca'      # calcium ion
    assert guess_element('CA', 'CAL') == 'Ca'
    assert guess_element('NA', 'NA') == 'Na'


def test_pdb_cryst1_roundtrip(tmp_path):
    """Unit cells survive a PDB round trip (review: CRYST1 was
    silently dropped in both directions)."""
    from enspara_tpu import io as io_mod

    traj = make_traj()
    cell = np.tile(np.diag([2.0, 3.0, 4.0]).astype(np.float32)[None],
                   (traj.n_frames, 1, 1))
    traj = type(traj)(traj.xyz, traj.topology,
                      unitcell_vectors=cell)
    pdb = str(tmp_path / 'c.pdb')
    traj.save(pdb)
    back = io_mod.load(pdb)
    assert back.unitcell_vectors is not None
    np.testing.assert_allclose(back.unitcell_vectors[0],
                               cell[0], atol=1e-3)


def test_gz_routing_rejects_non_pdb(tmp_path):
    from enspara_tpu import io as io_mod
    from enspara_tpu.exception import DataInvalid
    import pytest

    bogus = str(tmp_path / 't.xtc.gz')
    open(bogus, 'wb').write(b'\x1f\x8bctually not')
    with pytest.raises(DataInvalid, match='pdb.gz'):
        io_mod.load(bogus)


def test_trajectory_int_index_bounds():
    import pytest

    traj = make_traj()
    with pytest.raises(IndexError):
        traj[traj.n_frames]
    with pytest.raises(IndexError):
        traj[-traj.n_frames - 1]
    assert traj[-1].n_frames == 1


def test_two_pools_do_not_clobber():
    """Each pool gets a unique shared-buffer key (review: a second
    pool overwrote the parent-side buffer of the first)."""
    from enspara_tpu.util.parallel import pool_dense2d

    A = np.arange(6, dtype=np.float64).reshape(2, 3)
    B = -np.ones((3, 2))
    p1, get1 = pool_dense2d(A, processes=1)
    p2, get2 = pool_dense2d(B, processes=1)
    try:
        np.testing.assert_array_equal(get1(), A)
        np.testing.assert_array_equal(get2(), B)
    finally:
        p1.terminate(); p2.terminate()


def test_xtc_large_range_high_precision_roundtrip(tmp_path):
    """Quantized spans beyond 2^24 exercise the bitsize==0 encoder
    path whose >24-bit writes previously overflowed the bit
    accumulator (r5 review) — the stream must round-trip."""
    from enspara_tpu.io.xtc import write_xtc, load_xtc

    rng = np.random.default_rng(5)
    top = make_topology(2)
    n_at = top.n_atoms
    xyz = (rng.random((3, n_at, 3)).astype(np.float32) * 40.0)  # 40 nm
    traj = io.Trajectory(xyz, top)
    p = str(tmp_path / 'wide.xtc')
    write_xtc(p, traj, precision=1e6)
    back = load_xtc(p)
    assert_allclose(back.xyz, xyz, atol=2e-5)


def test_xtc_corrupt_smallidx_rejected(tmp_path):
    """A corrupt smallidx must fail loudly, not index out of the
    magicints table or divide by zero (r5 review)."""
    from enspara_tpu.io.xtc import write_xtc
    from enspara_tpu import io as io_mod

    traj = make_traj(n_frames=2, n_res=30)
    p = str(tmp_path / 'ok.xtc')
    write_xtc(p, traj)
    data = bytearray(open(p, 'rb').read())
    # frame layout: magic,natoms,step,time + 9*box + natoms + prec +
    # 3*minint + 3*maxint + smallidx -> smallidx at byte offset 4*21
    off = 4 * 21
    data[off:off + 4] = (10 ** 6).to_bytes(4, 'big')
    bad = str(tmp_path / 'bad.xtc')
    open(bad, 'wb').write(bytes(data))
    # graceful truncation: the corrupt frame is rejected (previously
    # an out-of-bounds magicints read), yielding zero frames
    assert io_mod.load(bad).n_frames == 0
