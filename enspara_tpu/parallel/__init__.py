from .mesh import (frame_mesh, shard_frames, replicated, n_devices,
                   initialize_distributed, FRAME_AXIS)
from . import ops
