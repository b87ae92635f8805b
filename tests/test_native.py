"""Native C++ kernel tests: must build and match the python fallbacks."""

import numpy as np
import scipy.sparse as sp


def _python_aggregate(S):
    n = S.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = S.indptr, S.indices
    na = 0
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if np.all(agg[nbrs] == -1):
            agg[i] = na
            agg[nbrs] = na
            na += 1
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        anbrs = agg[nbrs]
        anbrs = anbrs[anbrs != -1]
        if anbrs.size:
            agg[i] = anbrs[0]
    for i in range(n):
        if agg[i] == -1:
            agg[i] = na
            na += 1
    return agg


def test_native_builds():
    from porotpu.native import get_lib

    assert get_lib() is not None, "native library failed to build"


def test_native_aggregation_matches_python():
    from porotpu.native import greedy_aggregate

    rng = np.random.default_rng(0)
    A = sp.random(500, 500, 0.02, random_state=rng)
    S = ((A + A.T) > 0).astype(float).tocsr()
    S.setdiag(0)
    S.eliminate_zeros()
    agg_c, na = greedy_aggregate(S.indptr, S.indices, S.shape[0])
    agg_py = _python_aggregate(S)
    assert np.array_equal(agg_c, agg_py)
    assert na == agg_py.max() + 1
