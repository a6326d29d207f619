"""Host parallelism helpers. (reference: enspara/util/parallel.py)"""

import multiprocessing as mp
import os

__all__ = ['auto_nprocs']


def auto_nprocs():
    """Number of worker threads/processes to use: OMP_NUM_THREADS if
    set, else the CPU count. (reference: util/parallel.py:20)"""
    env = os.environ.get('OMP_NUM_THREADS')
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    return mp.cpu_count()
