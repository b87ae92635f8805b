from .dia import DIA, Dense, Transposed, device_matrix
from .sparse import ELL, FieldMatrix
from .spmv import ell_matvec
