from .core import committors, mfpts
from .tpt import reactive_fluxes, net_fluxes, reactive_populations
from .path import paths, top_path
