from .mesh import (dryrun, initialize_distributed, make_mesh,
                   sharded_frenet_sweep, sharded_sweep, sweep_statistics)

__all__ = ["dryrun", "initialize_distributed", "make_mesh",
           "sharded_frenet_sweep", "sharded_sweep", "sweep_statistics"]
