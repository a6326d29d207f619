from .cards import cards, cards_matrices
from .featurizers import RotamerFeaturizer
from . import disorder
# the reference star-exports the disorder vocabulary at package level
# (enspara/cards/__init__.py: `from .disorder import *`)
from .disorder import (transitions, traj_ord_disord_times,
                       create_disorder_traj, assign_order_disorder,
                       transition_stats, aggregate_mean_times)
