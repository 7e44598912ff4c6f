from .costs import (
    GameCost,
    make_game_cost,
    proximity_cost,
    proximity_quadraticize,
    quadraticize_stage,
    quadraticize_terminal,
    stage_cost,
    terminal_cost,
)
from .ilqr import SolveResult, ilqr_solve, line_search_alphas, make_solver, rollout
