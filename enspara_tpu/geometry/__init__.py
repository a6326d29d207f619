from . import libdist
from . import dihedrals
from . import rotamer
from . import sasa
from . import rmsf
from . import helix
from . import pockets
from .rotamer import all_rotamers, dihedral_angles
from .sasa import shrake_rupley
from .rmsf import rmsf_calc
from .pockets import get_pockets

# the smFRET dye stack pulls scipy.stats (>1 s of import time on slow
# hosts) and is only needed by the smFRET apps — load it lazily
# (PEP 562); `from enspara_tpu.geometry import dyes_from_expt_dist`
# still works.
_LAZY_DYE_MODULES = ('dyes_from_expt_dist', 'explicit_r0_calc',
                     'dye_lifetimes')


def __getattr__(name):
    if name in _LAZY_DYE_MODULES:
        import importlib
        mod = importlib.import_module('.' + name, __name__)
        globals()[name] = mod
        return mod
    raise AttributeError('module %r has no attribute %r'
                         % (__name__, name))


def __dir__():
    return sorted(list(globals()) + list(_LAZY_DYE_MODULES))
