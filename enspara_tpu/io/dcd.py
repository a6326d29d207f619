"""CHARMM/NAMD DCD trajectory read/write (Fortran-record binary,
coordinates in Angstroms on disk, nm in memory)."""

import struct

import numpy as np

from ..exception import MissingData

__all__ = ['load_dcd', 'write_dcd']


def _read_record(f):
    head = f.read(4)
    if len(head) < 4:
        return None
    (n,) = struct.unpack('<i', head)
    data = f.read(n)
    f.read(4)
    return data


def load_dcd(filename, top=None, stride=None, atom_indices=None,
             frame=None):
    from .trajectory import Trajectory

    with open(filename, 'rb') as f:
        header = _read_record(f)
        if header is None or header[:4] != b'CORD':
            raise MissingData('%s is not a DCD file' % filename)
        ints = struct.unpack('<9i', header[4:40])
        n_frames_hdr = ints[0]
        has_cell = struct.unpack('<i', header[44:48])[0]
        _read_record(f)  # title
        natoms_rec = _read_record(f)
        (n_atoms,) = struct.unpack('<i', natoms_rec)

        frames = []
        cells = []
        while True:
            if has_cell:
                cell = _read_record(f)
                if cell is None:
                    break
                cells.append(struct.unpack('<6d', cell))
            x = _read_record(f)
            if x is None:
                break
            y = _read_record(f)
            z = _read_record(f)
            if y is None or z is None:
                break
            frames.append((np.frombuffer(x, '<f4'),
                           np.frombuffer(y, '<f4'),
                           np.frombuffer(z, '<f4')))

    n_frames = len(frames)
    xyz = np.empty((n_frames, n_atoms, 3), np.float32)
    for i, (x, y, z) in enumerate(frames):
        xyz[i, :, 0] = x
        xyz[i, :, 1] = y
        xyz[i, :, 2] = z
    xyz *= 0.1  # Angstrom -> nm

    cell_vectors = None
    if cells:
        cv = np.zeros((n_frames, 3, 3), np.float32)
        for i, c in enumerate(cells[:n_frames]):
            # (a, gamma, b, beta, alpha, c) per CHARMM convention
            cv[i, 0, 0] = c[0] * 0.1
            cv[i, 1, 1] = c[2] * 0.1
            cv[i, 2, 2] = c[5] * 0.1
        cell_vectors = cv

    if frame is not None:
        sl = slice(frame, frame + 1)
    elif stride is not None and stride > 1:
        sl = slice(None, None, stride)
    else:
        sl = slice(None)
    xyz = xyz[sl]
    cell_vectors = cell_vectors[sl] if cell_vectors is not None else None

    ttop = top.top if hasattr(top, 'top') else top
    traj = Trajectory(xyz, ttop, unitcell_vectors=cell_vectors)
    if atom_indices is not None:
        traj = traj.atom_slice(atom_indices)
    return traj


def _write_record(f, data):
    f.write(struct.pack('<i', len(data)))
    f.write(data)
    f.write(struct.pack('<i', len(data)))


def write_dcd(filename, traj):
    xyz = np.asarray(traj.xyz, np.float32) * 10.0  # nm -> Angstrom
    n_frames, n_atoms = xyz.shape[:2]
    with open(filename, 'wb') as f:
        header = b'CORD' + struct.pack(
            '<9i', n_frames, 0, 1, n_frames, 0, 0, 0, 3 * n_atoms, 0)
        header += struct.pack('<f', 1.0)       # timestep
        header += struct.pack('<i', 0)          # no unit cell
        header += struct.pack('<8i', *([0] * 8))
        header += struct.pack('<2i', 0, 24)     # CHARMM version
        _write_record(f, header)
        title = b'Written by enspara_tpu'.ljust(80)
        _write_record(f, struct.pack('<i', 1) + title)
        _write_record(f, struct.pack('<i', n_atoms))
        for fr in range(n_frames):
            for d in range(3):
                _write_record(f,
                              np.ascontiguousarray(
                                  xyz[fr, :, d]).tobytes())
    return filename
