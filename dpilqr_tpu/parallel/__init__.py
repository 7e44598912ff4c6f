from .graph import graph_to_dict, interaction_graph
from .subproblems import (
    SubproblemBatch,
    extract_owner,
    gather_controls,
    gather_cost,
    gather_states,
    gather_subproblems,
)
from .distributed import DistributedResult, solve_distributed
from .rhc import RhcResult, RhcStepInfo, selfish_warmstart, solve_rhc
from .mesh import make_mesh, solve_distributed_sharded, solve_trials_sharded
