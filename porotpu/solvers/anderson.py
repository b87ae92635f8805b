"""Anderson acceleration of fixed-point iterations.

Re-implements lib/AndersonAcceleration.py with a TPU-native least-squares:
the reference gathers full vectors to rank 0, does a dense QR there and
broadcasts the coefficients (lib/AndersonAcceleration.py:53-66 — a
sequential gather-to-one bottleneck flagged in SURVEY.md §2.5).  Here the
LS problem min ||f + F^T alpha|| is solved through *Gram normal
equations*: G = F F^T and c = F f are tiny (order x order / order)
reductions that shard perfectly (row-partitioned dot products reduce with
psum under shard_map), followed by a replicated (order x order) solve —
strictly better than rank-0 QR at scale.

Formulation (Anderson type II, the math of
lib/AndersonAcceleration.py:60-69 with aligned increment pairs):
  f_k = g(x_k) - x_k
  pairs (dx_j, df_j) = (x_{j+1} - x_j, f_{j+1} - f_j), window ``order``
  alpha = argmin || f_k + sum_j alpha_j df_j ||
  x_{k+1} = x_k + f_k + sum_j alpha_j (dx_j + df_j)
Stagnation guard ||df|| < 1e-12 skips the pair push
(lib/AndersonAcceleration.py:45-47).

State is explicit and functional (fixed-size ring buffers, newest pair at
index -1) so the accelerator composes with jitted lax loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class AndersonState:
    X: jax.Array  # (order, n) dx history ring, newest at index -1
    F: jax.Array  # (order, n) df history ring, newest at index -1
    xk: jax.Array  # (n,) current iterate
    fk: jax.Array  # (n,) current residual g(xk) - xk
    prev_dx: jax.Array  # (n,) x_k - x_{k-1}
    k: jax.Array  # int32 step counter
    nhist: jax.Array  # int32 number of valid pairs

    def tree_flatten(self):
        return (
            self.X,
            self.F,
            self.xk,
            self.fk,
            self.prev_dx,
            self.k,
            self.nhist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def gram_ls_alpha(F, fk, nhist, reg=0.0):
    """alpha = argmin ||fk + F^T alpha|| over the last ``nhist`` rows of F.

    Solved via the (order x order) Gram system — the distributed-friendly
    replacement for the reference's rank-0 QR (SURVEY.md §2.5).  Rows
    beyond the history window get alpha = 0.
    """
    m = F.shape[0]
    G = F @ F.T
    c = F @ fk
    live = jnp.arange(m) >= (m - nhist)
    mask2 = live[:, None] & live[None, :]
    Gm = jnp.where(mask2, G, jnp.eye(m, dtype=G.dtype))
    tr = jnp.abs(jnp.trace(Gm)) / m
    Gm = Gm + (reg + 1e-12) * tr * jnp.eye(m, dtype=G.dtype)
    cm = jnp.where(live, c, 0.0)
    alpha = jnp.linalg.solve(Gm, -cm)
    return jnp.where(live, alpha, 0.0)


class AndersonAccelerator:
    """Functional Anderson mixing of a fixed-point output sequence.

    Usage: st = acc.init(n); st, x = acc.step(st, g(x)) per iteration.
    With order == 0 this is a pass-through (x = g(x)).
    """

    def __init__(self, order: int, reg: float = 0.0):
        self.order = max(int(order), 0)
        self.reg = reg

    def init(self, n: int, dtype=jnp.float32) -> AndersonState:
        m = max(self.order, 1)
        z = jnp.zeros((m, n), dtype=dtype)
        v = jnp.zeros((n,), dtype=dtype)
        return AndersonState(z, z, v, v, v, jnp.int32(0), jnp.int32(0))

    def step(self, state: AndersonState, gk: jax.Array):
        fk = gk - state.xk
        if self.order == 0:
            new = AndersonState(
                state.X, state.F, gk, fk, gk - state.xk, state.k + 1, state.nhist
            )
            return new, gk

        df = fk - state.fk
        push = (state.k > 0) & (jnp.linalg.norm(df) >= 1e-12)

        X2 = jnp.where(
            push,
            jnp.roll(state.X, -1, axis=0).at[-1].set(state.prev_dx),
            state.X,
        )
        F2 = jnp.where(
            push, jnp.roll(state.F, -1, axis=0).at[-1].set(df), state.F
        )
        nh2 = jnp.where(push, jnp.minimum(state.nhist + 1, self.order), state.nhist)

        def mix(_):
            alpha = gram_ls_alpha(F2, fk, nh2, self.reg)
            return state.xk + fk + alpha @ (X2 + F2)

        def plain(_):
            return gk

        xnew = jax.lax.cond(nh2 > 0, mix, plain, None)
        new = AndersonState(
            X2, F2, xnew, fk, xnew - state.xk, state.k + 1, nh2
        )
        return new, xnew
