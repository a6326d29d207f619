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
from . import dyes_from_expt_dist
from . import explicit_r0_calc
from . import dye_lifetimes
