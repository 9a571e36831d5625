from .mesh import make_mesh, scenario_sharding
from .sharded import (sharded_avi_solve, sharded_containment_prune,
                      equilibrium_superstep)

__all__ = ["make_mesh", "scenario_sharding", "sharded_avi_solve",
           "sharded_containment_prune", "equilibrium_superstep"]
