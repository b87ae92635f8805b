from .sparse import ELL, FieldMatrix
from .spmv import ell_matvec
