"""Highest-flux pathway extraction from a net-flux network.
(reference: enspara/tpt/path.py, itself derived from msmbuilder)

``top_path`` finds the maximum-bottleneck ("widest") path from any
source to any sink with a heap-based Dijkstra variant — a host graph
algorithm by design (SURVEY.md §3.4). ``paths`` iteratively removes each
found path ('subtract' or 'bottleneck') until ``num_paths`` or the flux
cutoff is reached.
"""

import copy
import heapq

import numpy as np
import scipy.sparse

__all__ = ['paths', 'top_path']


def top_path(sources, sinks, net_flux):
    """Maximum-bottleneck path from sources to sinks.

    Returns ``(path_states, path_flux)`` where path_flux is the minimum
    edge flux along the path. (reference: tpt/path.py:46)
    """
    sources = np.array(sources, dtype=int).reshape(-1)
    sinks = np.array(sinks, dtype=int).reshape(-1)

    if scipy.sparse.issparse(net_flux):
        net_flux = net_flux.toarray()
    net_flux = np.asarray(net_flux)
    n_states = net_flux.shape[0]

    visited = np.zeros(n_states, dtype=bool)
    previous_node = np.full(n_states, -1, dtype=int)
    min_fluxes = np.full(n_states, -np.inf)
    min_fluxes[sources] = np.inf

    # max-heap on bottleneck flux (negated for heapq)
    heap = [(-np.inf, int(s)) for s in sources]
    heapq.heapify(heap)

    while heap:
        neg_flux, node = heapq.heappop(heap)
        if visited[node]:
            continue
        visited[node] = True

        if np.all(visited[sinks]):
            break

        neighbors = np.where(net_flux[node, :] > 0)[0]
        if len(neighbors) == 0:
            continue

        # bottleneck to each neighbor = min(path flux so far, edge flux)
        new_fluxes = np.minimum(net_flux[node, neighbors],
                                min_fluxes[node])
        better = (~visited[neighbors]) & (new_fluxes > min_fluxes[neighbors])
        upd = neighbors[better]
        min_fluxes[upd] = new_fluxes[better]
        previous_node[upd] = node
        for u, f in zip(upd, new_fluxes[better]):
            heapq.heappush(heap, (-f, int(u)))

    path = [int(sinks[min_fluxes[sinks].argmax()])]
    while previous_node[path[-1]] != -1:
        path.append(int(previous_node[path[-1]]))

    return np.array(path[::-1]), min_fluxes[path[0]]


def _remove_bottleneck(net_flux, path):
    """Zero only the path's bottleneck edge. (reference: tpt/path.py:163)"""
    net_flux = copy.copy(net_flux)
    bottleneck_ind = net_flux[path[:-1], path[1:]].argmin()
    net_flux[path[bottleneck_ind], path[bottleneck_ind + 1]] = 0.0
    return net_flux


def _subtract_path_flux(net_flux, path):
    """Subtract the path flux from every edge along it.
    (reference: tpt/path.py:178)"""
    net_flux = copy.copy(net_flux)
    net_flux[path[:-1], path[1:]] -= net_flux[path[:-1], path[1:]].min()
    bottleneck_ind = net_flux[path[:-1], path[1:]].argmin()
    net_flux[path[bottleneck_ind], path[bottleneck_ind + 1]] = 0.0
    return net_flux


def paths(sources, sinks, net_flux, remove_path='subtract',
          num_paths=np.inf, flux_cutoff=(1 - 1E-10)):
    """Top-N highest-flux paths by iterative removal.
    (reference: tpt/path.py:197)

    Returns ``(paths_list, fluxes_array)``.
    """
    if not callable(remove_path):
        if remove_path == 'subtract':
            remove_path = _subtract_path_flux
        elif remove_path == 'bottleneck':
            remove_path = _remove_bottleneck
        else:
            raise ValueError(
                "remove_path_func (%s) must be a callable or one of "
                "['subtract', 'bottleneck']" % str(remove_path))

    if scipy.sparse.issparse(net_flux):
        net_flux = net_flux.toarray()
    net_flux = np.array(net_flux, copy=True)

    found_paths = []
    fluxes = []

    total_flux = net_flux[sources, :].sum()

    counter = 0
    expl_flux = 0.0
    while True:
        path, flux = top_path(sources, sinks, net_flux)
        if np.isinf(flux) or flux <= 0:
            break

        found_paths.append(path)
        fluxes.append(flux)

        expl_flux += flux / total_flux
        counter += 1
        if counter >= num_paths or expl_flux >= flux_cutoff:
            break

        net_flux = remove_path(net_flux, path)

    return found_paths, np.array(fluxes)
