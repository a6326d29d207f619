from .util import (ClusterResult, assign_to_nearest_center,
                   find_cluster_centers)
from .kcenters import KCenters, kcenters
