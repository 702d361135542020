from .config_base import ConfigBase  # noqa: F401
from .distributed import (  # noqa: F401
    barrier,
    broadcast_object,
    global_leader_only,
    global_rank,
    init_distributed,
    is_global_leader,
    is_local_leader,
    local_leader_only,
    world_size,
)
from .helpers import flatten_dict, to_device, to_numpy, tree_map  # noqa: F401
from .logging import setup_logging  # noqa: F401
