"""enspara_tpu: a TPU-native framework for building and analyzing Markov
State Models from molecular-dynamics data at scale.

Capability-parity rebuild of bowman-lab/enspara, re-architected for TPU:
JAX/XLA/Pallas kernels replace Cython+OpenMP, a jax.sharding device mesh
replaces MPI, padded+masked device arrays replace host raggedness in every
kernel, and lax control flow replaces stateful Python loops.
"""

import logging

logging.basicConfig(level=logging.WARNING)

__version__ = '0.1.0'

from . import exception  # noqa: F401,E402
from . import citation  # noqa: F401,E402
