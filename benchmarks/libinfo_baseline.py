#!/usr/bin/env python
"""Measured CPU denominator for the CARDS joint-counts family
(VERDICT r4 item 9).

The reference's joint-counts path is the Cython kernel
``enspara/info_theory/libinfo.pyx:matrix_bincount2d`` — a three-deep
loop (OpenMP ``prange`` over feature rows, then columns, then frames)
doing one histogram increment per (row, col, frame). Cython is not
installed on this host, so the kernel cannot be built; this probe
measures a C++ stand-in with the SAME loop order, data layout
((frames, features) C-order inputs, (F, F, S, S) uint32 counts) and
optimization level (-O2, Cython's default), which is exactly the C
code Cython generates for that loop modulo bounds-check elision.

The work is exactly O(F^2 * T) increments, and rows are independent
(disjoint count slabs), so the probe measures a size grid, checks
linearity, and extrapolates to the config3 workload (4 MI matrices at
500k frames x 150 features) at BOTH 1 thread (this host) and a
16-core production node (perfect prange scaling — conservative in the
reference's favor). The 16-core number is the committed denominator
bench.py uses for ``cards_joint_counts_4xmi_s``.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

CPP = r"""
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <chrono>

int main(int argc, char **argv) {
    long F = atol(argv[1]), T = atol(argv[2]), S = atol(argv[3]);
    std::vector<int32_t> a(T * F), b(T * F);
    unsigned seed = 12345u;
    for (long i = 0; i < T * F; ++i) {
        seed = seed * 1664525u + 1013904223u;
        a[i] = (int32_t)(seed % S);
        seed = seed * 1664525u + 1013904223u;
        b[i] = (int32_t)(seed % S);
    }
    std::vector<uint32_t> jc(F * F * S * S, 0u);
    auto t0 = std::chrono::steady_clock::now();
    for (long ar = 0; ar < F; ++ar)
        for (long br = 0; br < F; ++br) {
            uint32_t *slab = jc.data() + ((ar * F + br) * S) * S;
            for (long t = 0; t < T; ++t)
                slab[a[t * F + ar] * S + b[t * F + br]] += 1;
        }
    auto t1 = std::chrono::steady_clock::now();
    uint64_t total = 0;
    for (auto v : jc) total += v;
    double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("{\"elapsed_s\": %.6f, \"increments\": %ld, "
           "\"checksum\": %llu}\n",
           dt, F * F * T, (unsigned long long)total);
    return 0;
}
"""

N_MATRICES = 4          # CARDS: 4 MI matrices per run
F_FULL, T_FULL = 150, 500_000
N_STATES = 3            # rotamer alphabets are 3-state
PROD_CORES = 16


def main():
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, 'libinfo_baseline.cpp')
        exe = os.path.join(td, 'libinfo_baseline')
        with open(src, 'w') as f:
            f.write(CPP)
        subprocess.run(['g++', '-O2', '-o', exe, src], check=True)

        grid = [(30, 10_000), (50, 10_000), (50, 40_000),
                (100, 20_000)]
        points = []
        for F, T in grid:
            r = json.loads(subprocess.run(
                [exe, str(F), str(T), str(N_STATES)],
                capture_output=True, check=True).stdout)
            assert r['checksum'] == F * F * T
            points.append({'f': F, 't': T,
                           'elapsed_s': r['elapsed_s'],
                           'increments_per_s':
                               round(r['increments'] / r['elapsed_s'])})
            print('# F=%d T=%d: %.3fs (%.2e incr/s)'
                  % (F, T, r['elapsed_s'],
                     points[-1]['increments_per_s']),
                  file=sys.stderr, flush=True)

        rates = [p['increments_per_s'] for p in points]
        rate = min(rates)          # conservative: the slowest point
        linearity = max(rates) / min(rates)
        full_increments = N_MATRICES * F_FULL * F_FULL * T_FULL
        one_core_s = full_increments / rate
        result = {
            'probe': 'reference-cpu-libinfo',
            'method': ('C++ -O2 stand-in for the unbuildable Cython '
                       'matrix_bincount2d (identical loop order, '
                       'layout and counts dtype; see '
                       'benchmarks/libinfo_baseline.py docstring); '
                       'O(F^2 T) size grid extrapolated with the '
                       'slowest observed rate'),
            'n_states': N_STATES,
            'grid': points,
            'rate_linearity_max_over_min': round(linearity, 3),
            'increments_per_s_1core': rate,
            'workload': {'n_matrices': N_MATRICES, 'f': F_FULL,
                         't': T_FULL,
                         'total_increments': full_increments},
            'reference_1core_s': round(one_core_s, 1),
            'reference_total_s': round(one_core_s / PROD_CORES, 1),
            'reference_total_s_note':
                'assumes PERFECT %d-way prange scaling on a '
                'production node (rows write disjoint slabs) — '
                'conservative in the reference\'s favor' % PROD_CORES,
            'timestamp': time.strftime('%Y-%m-%dT%H:%M:%S%z'),
        }
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'reference-cpu-libinfo-result.json')
        with open(out, 'w') as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result, indent=1))


if __name__ == '__main__':
    main()
