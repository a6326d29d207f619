"""Backend/platform selection that works under site hooks.

``JAX_PLATFORMS`` is latched into ``jax.config`` when jax is imported;
deployment images that pre-import jax (or pin ``jax_platforms`` in a
site hook) silently override the env var, and the legacy
``JAX_PLATFORM_NAME`` can leave a stale platform name in the config
that later fails backend lookup. Mutating the config before the first
device op is the only reliable route — the same robustness stance as
the reference's comm bootstrap (enspara/mpi/__init__.py:11-28: degrade
to what the environment can actually provide).
"""

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ['select_platform']


def select_platform(platform=None):
    """Pin jax to ``platform`` ('cpu', 'tpu', ...) for this process.

    When ``platform`` is None, reads ``$ENSPARA_TPU_PLATFORM`` and is a
    no-op if that is unset/empty. Safe to call multiple times; logs
    (rather than raises) if the backend already initialized to
    something else — at that point the choice is frozen.
    """
    if platform is None:
        platform = os.environ.get('ENSPARA_TPU_PLATFORM', '')
    if not platform:
        return
    import jax

    try:
        jax.config.update('jax_platforms', platform)
    except Exception as e:  # pragma: no cover - backend already live
        logger.warning('could not pin jax platform to %r: %s',
                       platform, e)
