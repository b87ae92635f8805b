from .amg import AMG, amg_setup
from .inner import InnerSolver, InnerConfig
from .block import BlockPreconditioner
