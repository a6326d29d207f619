"""Native (C++) host kernels: sequential solvers and codecs where XLA is
the wrong tool. Shared objects are compiled on demand with g++ via the
bundled Makefile; every consumer has a pure-Python fallback."""

import logging
import os
import subprocess

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library(name):
    """ctypes-load ``lib<name>.so`` from the native dir, compiling it
    first if needed. Returns None when no toolchain is available."""
    import ctypes

    path = os.path.join(_NATIVE_DIR, 'lib%s.so' % name)
    if not os.path.exists(path):
        src = os.path.join(_NATIVE_DIR, '%s.cpp' % name)
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ['make', '-C', _NATIVE_DIR, 'lib%s.so' % name],
                check=True, capture_output=True, timeout=120)
        except Exception as e:
            logger.warning('Could not build native lib%s.so (%s); '
                           'using pure-Python fallback.', name, e)
            return None
    try:
        return ctypes.CDLL(path)
    except OSError as e:
        logger.warning('Could not load %s (%s); using pure-Python '
                       'fallback.', path, e)
        return None
