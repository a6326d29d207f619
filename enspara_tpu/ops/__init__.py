from . import distances, qcp
