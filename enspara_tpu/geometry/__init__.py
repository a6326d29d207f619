from . import libdist
