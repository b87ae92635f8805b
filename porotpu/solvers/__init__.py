from .result import SolveResult
from .cg import cg
from .gmres import gmres, fgmres
from .chebyshev import chebyshev, estimate_spectrum
from .basic import richardson, preonly
from .aar import aar
from .anderson import AndersonAccelerator, AndersonState
