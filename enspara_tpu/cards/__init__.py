from .cards import cards, cards_matrices
from .featurizers import RotamerFeaturizer
from . import disorder
