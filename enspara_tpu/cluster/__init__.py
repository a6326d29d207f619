from .util import (ClusterResult, assign_to_nearest_center,
                   find_cluster_centers)
from .kcenters import KCenters, kcenters
from .kmedoids import KMedoids, kmedoids
from .hybrid import KHybrid, hybrid, hybrid_device
