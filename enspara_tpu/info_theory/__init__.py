"""Information theory calculations (entropy, divergence, joint counts,
mutual information, exposons)."""

from . import entropy
from . import mutual_info
from . import exposons
from . import libinfo
from .entropy import (shannon_entropy, kl_divergence, js_divergence,
                      relative_entropy_msm, relative_entropy_per_state,
                      energy_to_probability)
from .mutual_info import (mi_matrix, weighted_mi, joint_counts,
                          mutual_information,
                          channel_capacity_normalization,
                          mi_to_nmi, mi_to_apc, mi_to_nmi_apc,
                          deconvolute_network)
from .exposons import exposons as compute_exposons, exposons_from_sasas
