"""Deprecated alias of :mod:`enspara_tpu.ra`, kept so code written
against the reference's ``enspara.util.array`` import path ports
unchanged (reference: enspara/util/array.py — same shim, same
warning)."""

import warnings

from ..ra.ra import *  # noqa: F401,F403

warnings.warn('enspara_tpu.util.array has been moved to its own module '
              'at enspara_tpu.ra', PendingDeprecationWarning)
