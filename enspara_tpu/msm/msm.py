"""The MSM estimator object. (reference: enspara/msm/msm.py:27)"""

import json
import logging
import os
import pickle
import shutil
import tempfile

import numpy as np
from scipy import sparse
from scipy.io import mmwrite, mmread

from ..exception import ImproperlyConfigured
from . import builders
from .transition_matrices import (assigns_to_counts, TrimMapping,
                                  trim_disconnected)

logger = logging.getLogger(__name__)

__all__ = ['MSM']


class MSM(object):
    """Sklearn-style wrapper fitting a Markov state model from state
    assignments: counts at ``lag_time`` -> optional ergodic trim ->
    ``method`` (a builder from :mod:`enspara_tpu.msm.builders` or its
    name as a string).
    """

    @classmethod
    def from_assignments(cls, assignments, **kwargs):
        m = cls(**kwargs)
        m.fit(assignments)
        return m

    def __init__(self, lag_time, method, trim=False, sliding_window=True,
                 max_n_states=None):
        self.lag_time = lag_time
        self.trim = trim
        self.max_n_states = max_n_states
        if callable(method):
            self.method = method
        else:
            self.method = getattr(builders, method)
        self.sliding_window = sliding_window

    def fit(self, assigns):
        tcounts = assigns_to_counts(
            assigns,
            max_n_states=self.max_n_states,
            lag_time=self.lag_time,
            sliding_window=self.sliding_window)
        return self.fit_from_counts(tcounts)

    def fit_from_counts(self, tcounts):
        """Trim + build from a precomputed transition-count matrix —
        counts are additive over trajectories, so callers that already
        hold per-trajectory counts (e.g. bootstrap resampling) can
        skip the re-count."""
        if self.trim:
            original_state_count = tcounts.shape[0]
            self.mapping_, tcounts = trim_disconnected(tcounts)
            logger.info('After ergodic trimming, %s of %s states remain',
                        len(self.mapping_.to_original),
                        original_state_count)
        else:
            self.mapping_ = TrimMapping(zip(range(tcounts.shape[0]),
                                            range(tcounts.shape[0])))

        self.tcounts_, self.tprobs_, self.eq_probs_ = self.method(tcounts)
        return self

    @property
    def n_states_(self):
        if hasattr(self, 'tprobs_'):
            assert self.tprobs_.shape[0] == self.tcounts_.shape[0]
            return self.tprobs_.shape[0]
        raise ImproperlyConfigured(
            'MSM must be fit before it has a number of states.')

    @property
    def config(self):
        return {
            'lag_time': self.lag_time,
            'sliding_window': self.sliding_window,
            'trim': self.trim,
            'method': self.method,
        }

    @property
    def result_(self):
        if getattr(self, 'tcounts_', None) is not None:
            return {
                'tcounts_': self.tcounts_,
                'tprobs_': self.tprobs_,
                'eq_probs_': self.eq_probs_,
                'mapping_': self.mapping_,
            }
        return None

    def __eq__(self, other):
        if self is other:
            return True
        if self.config != other.config:
            return False
        if self.result_ is None:
            return other.result_ is None

        if not np.all(self.eq_probs_ == other.eq_probs_):
            return False
        if self.mapping_ != other.mapping_:
            return False
        if (self.tcounts_.shape != other.tcounts_.shape
                or self.tprobs_.shape != other.tprobs_.shape):
            return False

        tc_s, tc_o = sparse.csr_matrix(self.tcounts_), \
            sparse.csr_matrix(other.tcounts_)
        if (tc_s != tc_o).nnz != 0:
            return False

        f_self = sparse.find(sparse.csr_matrix(self.tprobs_))
        f_other = sparse.find(sparse.csr_matrix(other.tprobs_))
        if (not np.all(f_self[0] == f_other[0])
                or not np.all(f_self[1] == f_other[1])):
            return False
        if not np.allclose(f_self[2], f_other[2]):
            return False
        return True

    def __repr__(self):
        return 'MSM:' + str({'config': self.config, 'fit': self.result_})

    __str__ = __repr__

    @classmethod
    def load(cls, path, manifest='manifest.json'):
        """Load an MSM from its manifest directory."""
        if not os.path.isdir(path):
            raise NotImplementedError(
                "MSMs don't handle zip archives yet.")

        with open(os.path.join(path, manifest)) as f:
            fname_dict = json.load(f)
        fname_dict = {k: os.path.join(path, v)
                      for k, v in fname_dict.items()}

        with open(fname_dict['config'], 'rb') as f:
            config = pickle.load(f)

        msm = cls(**config)
        msm.tcounts_ = mmread(fname_dict['tcounts_'])
        msm.tprobs_ = mmread(fname_dict['tprobs_'])
        msm.mapping_ = TrimMapping.load(fname_dict['mapping_'])
        msm.eq_probs_ = np.loadtxt(fname_dict['eq_probs_'])
        return msm

    def save(self, path, force=False, zipfile=False, **filenames):
        """Serialize to a manifest directory: mapping.csv, tcounts.mtx,
        tprobs.mtx, eq-probs.dat, config.pkl, manifest.json."""
        fname_dict = {
            'mapping_': 'mapping.csv',
            'tcounts_': 'tcounts.mtx',
            'tprobs_': 'tprobs.mtx',
            'eq_probs_': 'eq-probs.dat',
            'config': 'config.pkl',
        }
        fname_dict.update(filenames)

        with tempfile.TemporaryDirectory(
                prefix=os.path.basename(path)) as tempdir:

            def tmp_fname(prop):
                return os.path.join(tempdir, fname_dict[prop])

            with open(os.path.join(tempdir, 'manifest.json'), 'w') as f:
                json.dump(fname_dict, f, sort_keys=True, indent=4,
                          separators=(',', ': '))
            with open(tmp_fname('mapping_'), 'w') as f:
                self.mapping_.write(f)
            with open(tmp_fname('tcounts_'), 'wb') as f:
                mmwrite(f, sparse.coo_matrix(self.tcounts_))
            with open(tmp_fname('tprobs_'), 'wb') as f:
                mmwrite(f, sparse.coo_matrix(self.tprobs_), precision=20)
            with open(tmp_fname('eq_probs_'), 'wb') as f:
                np.savetxt(f, np.array(self.eq_probs_))
            with open(tmp_fname('config'), 'wb') as f:
                pickle.dump(self.config, f)

            if zipfile:
                raise NotImplementedError(
                    "MSMs don't do zip archives yet.")
            if force and os.path.isdir(path):
                shutil.rmtree(path)
            shutil.copytree(tempdir, path)
