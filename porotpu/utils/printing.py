"""Rank-0 logging (reference: lib/Printing.py:4-6).

In the reference every MPI rank runs the same script and only rank 0 prints.
The JAX equivalent is the process index: under multi-host execution only
process 0 prints; on a single host this is always true.
"""

from __future__ import annotations

import sys


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def parprint(*args, **kwargs):
    """Print + flush only on the primary process."""
    if _is_primary():
        print(*args, **kwargs)
        sys.stdout.flush()
