"""Bundled-data resolution.

The reference ships a FRET-dye library (PDB structures, point clouds,
R0 spectral-overlap tables, libraries.yml) under enspara/data/dyes,
aggregated from published GPLv3 datasets (Montepietra et al. 2024 and
the FRET-dye point clouds of the Bowman lab). We do not re-bundle that
data; instead the library directory is resolved at runtime from:

1. ``$ENSPARA_TPU_DYE_DIR``
2. ``<this package>/data/dyes`` — populated by
   ``python -m enspara_tpu.data.fetch_dye_library`` (one-time download
   from the upstream enspara repository; see that module for
   provenance and licensing)
3. ONLY when ``$ENSPARA_TPU_USE_REFERENCE_DATA=1``: a local reference
   checkout at /root/reference/enspara/data/dyes (development
   convenience, never silently relied on).
4. Last resort: ``<this package>/data/dyes_builtin`` — a minimal
   SYNTHETIC two-dye library (procedurally generated, MIT; see
   tools/make_builtin_dyes.py) shipped in the wheel so air-gapped
   installs can run the smFRET pipeline offline. Not real
   fluorophores; for science, fetch the full library.
"""

import os

from ..exception import MissingData

_HERE = os.path.dirname(os.path.abspath(__file__))


def _candidates():
    cands = [
        os.environ.get('ENSPARA_TPU_DYE_DIR', ''),
        os.path.join(_HERE, 'dyes'),
    ]
    if os.environ.get('ENSPARA_TPU_USE_REFERENCE_DATA') == '1':
        cands.append('/root/reference/enspara/data/dyes')
    # last resort: the builtin synthetic mini library shipped in the
    # wheel (two procedurally generated dyes; see
    # tools/make_builtin_dyes.py) so air-gapped installs can still run
    # the smFRET pipeline end to end
    cands.append(os.path.join(_HERE, 'dyes_builtin'))
    return cands


def dye_library_path(required=True):
    """Directory of the FRET dye library, or None/raise if absent.

    Resolving to the builtin SYNTHETIC library warns loudly (once):
    its numbers are physically plausible but are not measurements of
    real fluorophores, and a user who simply forgot to fetch must not
    mistake them for science."""
    import logging
    for cand in _candidates():
        if cand and os.path.isdir(cand):
            if (os.path.normpath(cand)
                    == os.path.join(_HERE, 'dyes_builtin')
                    and not getattr(dye_library_path,
                                    '_warned_builtin', False)):
                dye_library_path._warned_builtin = True
                logging.getLogger(__name__).warning(
                    'Using the builtin SYNTHETIC dye library '
                    '(SimFluor test dyes) — NOT real fluorophore '
                    'data. For science, run `python -m '
                    'enspara_tpu.data.fetch_dye_library` or set '
                    '$ENSPARA_TPU_DYE_DIR.')
            return cand
    if required:
        raise MissingData(
            'No FRET dye library found. Run `python -m '
            'enspara_tpu.data.fetch_dye_library` to download it '
            '(GPLv3 data, kept out of this MIT package), or set '
            '$ENSPARA_TPU_DYE_DIR to an existing library directory.')
    return None
