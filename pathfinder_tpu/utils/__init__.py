from pathfinder_tpu.utils.misc import findmax_skipnan

__all__ = ["findmax_skipnan"]
