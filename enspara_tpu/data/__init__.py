"""Bundled-data resolution.

The reference ships a FRET-dye library (PDB structures, point clouds,
R0 spectral-overlap tables, libraries.yml) under enspara/data/dyes,
aggregated from published GPLv3 datasets (Montepietra et al. 2024 and
the FRET-dye point clouds of the Bowman lab). We do not re-bundle that
data; instead the library directory is resolved at runtime from:

1. ``$ENSPARA_TPU_DYE_DIR``
2. ``<this package>/data/dyes`` (drop the upstream library here)
3. the reference checkout at /root/reference/enspara/data/dyes when
   present (read-only).
"""

import os

from ..exception import MissingData

_HERE = os.path.dirname(os.path.abspath(__file__))

_CANDIDATES = [
    os.environ.get('ENSPARA_TPU_DYE_DIR', ''),
    os.path.join(_HERE, 'dyes'),
    '/root/reference/enspara/data/dyes',
]


def dye_library_path(required=True):
    """Directory of the FRET dye library, or None/raise if absent."""
    for cand in _CANDIDATES:
        if cand and os.path.isdir(cand):
            return cand
    if required:
        raise MissingData(
            'No FRET dye library found. Set $ENSPARA_TPU_DYE_DIR to a '
            'directory containing the dye PDBs/point clouds (see '
            'enspara_tpu/data/__init__.py).')
    return None
