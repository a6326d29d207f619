from . import builders
from .msm import MSM
from .transition_matrices import (assigns_to_counts, eigenspectrum,
                                  trim_disconnected, eq_probs,
                                  TrimMapping, assigns_to_counts_device)
from .timescales import implied_timescales
from .eigen_device import (eigenspectrum_reversible,
                           implied_timescales_device)
from . import bace
from .bootstrap import bootstrap, MSMs
from .synthetic_data import (synthetic_trajectory, synthetic_ensemble,
                             synthetic_trajectory_device)
