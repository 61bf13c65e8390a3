from pathfinder_tpu.parallel.sharding import (
    make_path_executor,
    paths_mesh,
)

__all__ = ["make_path_executor", "paths_mesh"]
