from .mesh import (dryrun, make_mesh, sharded_sweep, sweep_statistics)

__all__ = ["dryrun", "make_mesh", "sharded_sweep", "sweep_statistics"]
