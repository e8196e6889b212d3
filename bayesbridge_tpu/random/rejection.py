"""Lane-compacted rejection-sampling driver.

The reference's rejection samplers are scalar loops: each draw spins
until ITS chain accepts (reference:
bayesbridge/random/tilted_stable/tilted_stable.pyx:126-135 loops lanes
one at a time). A straight vectorization — one masked ``lax.while_loop``
over all lanes — is correct but wasteful on TPU: the loop runs until the
SLOWEST lane accepts (measured 40-80 rounds for 10-20k lanes whose
median lane accepts in 1-2), and every round evaluates the full-width
transcendental math for lanes that finished long ago. TPU time for this
work is VPU-throughput-bound, i.e. proportional to (rounds x width).

This driver keeps the masked-while structure but progressively COMPACTS
the unfinished lanes into geometrically smaller buffers:

    width n      : rounds until <= n/4 lanes are active
    width n/4    : rounds until <= n/16 active
    ...
    width >= 512 : rounds until all accept (or the safety cap)

Each level gathers the stragglers (a cumsum scatter, O(width), no sort)
and scatters finished values back to their original slots. Total work
drops from (worst-lane rounds) x n to about (expected rounds) x n plus a
short tail at width 512 — an order of magnitude for the Gibbs-sized
draws — while sampling the exact same per-lane chains (each attempt is
still one full-lane-vector proposal round).

At the final (narrow) level the rounds are LATENCY-bound — each round is
a fixed dependency chain of transcendental vector ops whose cost no
longer depends on width — so the tail additionally runs `tail_replicas`
independent chains per lane side by side and takes each lane's
first-accepted replica, dividing the worst-lane round count by roughly
the replica factor.

CORRECTNESS REQUIREMENT for ``tail_replicas > 1``: the chain's accepted
VALUE must be independent of its acceptance TIME, because first-finisher
selection conditions on finishing early. This holds whenever every round
makes an iid attempt, or attempts whose durations don't depend on the
eventual value (divide-conquer: iid partition proposals; Devroye double
rejection: the aux-retry count is independent of the accepted auxiliary
value). It does NOT hold for chains whose round count depends on which
mixture piece is being proposed — the Polya-Gamma sampler's
inverse-Gaussian piece retries across rounds while its exponential piece
never does (selection would over-sample the exponential piece; observed
as a ~10%% bias in the PG(1, 1) mean at width 100). Because each caller
must PROVE value/time independence, the default is the statistically
safe ``tail_replicas=1``; callers with an argued-and-tested proof (the
two tilted-stable kernels) opt in to replicas explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax



def uniform_open(key, shape, dtype):
    """Uniform on (0, 1): open at zero so downstream logs stay finite.
    Shared by the rejection samplers (tilted-stable, Polya-Gamma)."""
    tiny = jnp.finfo(dtype).tiny
    return jax.random.uniform(key, shape, dtype, minval=tiny)

def _plan_widths(n, min_width, shrink):
    """Static, strictly decreasing level widths starting at n."""
    widths = [n]
    while widths[-1] > min_width:
        w = max(min_width, -(-widths[-1] // shrink))
        w = min(int(-(-w // 128) * 128), widths[-1] - 1)
        if w <= 0 or w >= widths[-1]:
            break
        widths.append(w)
    return widths


def run_rejection(key, params, state, attempt, value_init,
                  min_width=512, shrink=4, max_rounds=256,
                  tail_replicas=1, latch='on_accept',
                  attempts_per_round=1):
    """Run per-lane rejection chains to acceptance, with compaction.

    Parameters
    ----------
    key : jax PRNG key
    params : pytree of (n,)-shaped arrays
        Per-lane constants of the chain (tilts, precomputed rates, ...).
    state : pytree of (n,)-shaped arrays
        Per-lane mutable chain state (e.g. a "retrying this proposal
        piece" flag). Frozen once a lane accepts. Pass ``{}`` for
        memoryless chains.
    attempt : callable(key, params, state) -> (state, value, ok)
        One proposal round for every lane: returns the updated state, the
        candidate value and a per-lane acceptance flag. Must be pure
        element-wise (no cross-lane coupling) so that compaction cannot
        change any lane's distribution.
    value_init : (n,) array
        Initial per-lane values, returned for lanes that never accept
        within `max_rounds` (under the default ``latch='on_accept'``).
    latch : 'on_accept' | 'every_round'
        'on_accept' records a lane's value only when it accepts, so a
        capped lane returns its ``value_init`` entry. 'every_round'
        records the candidate on every round a lane is active — for
        chains whose value accumulates monotonically (divide-and-conquer
        partial sums), a capped lane then returns its progress so far.
    attempts_per_round : int
        Chain this many attempt rounds inside each ``lax.while_loop``
        body — statistically a no-op (identical to that many sequential
        rounds; lanes latch on their first acceptance in attempt order).
        A tuning knob for latency-bound regimes; on v5e the Gibbs-sized
        draws measure flat in it (the kernels are VPU-transcendental-
        throughput-bound, see BASELINE.md), so the default is 1. Exit
        conditions are checked at this granularity; ``max_rounds``
        still counts single attempts.

    Returns
    -------
    (value, n_rounds) : ((n,) array, int32 scalar)
    """
    n = value_init.shape[0]
    dtype = value_init.dtype
    widths = _plan_widths(n, min_width, shrink)

    result = jnp.zeros(n, dtype)
    carry = dict(
        key=key,
        params=params,
        state=state,
        value=value_init,
        acc=jnp.zeros(n, bool),
        idx=jnp.arange(n, dtype=jnp.int32),
        rounds=jnp.int32(0),
    )

    def round_once(c):
        key, k_att = jax.random.split(c['key'])
        new_state, val, ok = attempt(k_att, c['params'], c['state'])
        active = ~c['acc']
        take = jnp.logical_and(active, ok)
        record = active if latch == 'every_round' else take
        value = jnp.where(record, val, c['value'])
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old),
            new_state, c['state'])
        return {**c, 'key': key, 'state': state, 'value': value,
                'acc': jnp.logical_or(c['acc'], take),
                'rounds': c['rounds'] + 1}

    def body(c):
        for _ in range(attempts_per_round):
            c = round_once(c)
        return c

    for level, width in enumerate(widths):
        is_last = level + 1 == len(widths)

        if is_last and tail_replicas > 1:
            # Replicate each lane into `tail_replicas` independent
            # chains; loop until every lane has an accepted replica.
            reps = tail_replicas
            tile = lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1)) \
                if a.ndim else a
            lane_idx = carry['idx']
            carry = dict(
                key=carry['key'],
                params=jax.tree_util.tree_map(tile, carry['params']),
                state=jax.tree_util.tree_map(tile, carry['state']),
                value=tile(carry['value']),
                acc=tile(carry['acc']),
                rounds=carry['rounds'],
            )

            def tail_cond(c):
                lane_done = jnp.any(c['acc'].reshape(reps, width), axis=0)
                return jnp.logical_and(jnp.any(~lane_done),
                                       c['rounds'] < max_rounds)

            carry = lax.while_loop(tail_cond, body, carry)
            acc_r = carry['acc'].reshape(reps, width)
            val_r = carry['value'].reshape(reps, width)
            winner = jnp.argmax(acc_r, axis=0)
            cols = jnp.arange(width)
            lane_done = jnp.any(acc_r, axis=0)
            # Capped lanes fall back to replica 0's chain (its latest
            # recorded value under `latch`, its entry value otherwise).
            value = jnp.where(lane_done, val_r[winner, cols], val_r[0])
            result = result.at[lane_idx].set(value, mode='drop')
            break

        next_width = 0 if is_last else widths[level + 1]

        def cond(c, _next=next_width):
            n_active = jnp.sum(~c['acc'])
            return jnp.logical_and(n_active > _next,
                                   c['rounds'] < max_rounds)

        carry = lax.while_loop(cond, body, carry)

        # Scatter this level's values home. Lanes still active get their
        # provisional value written too; if they accept at a later level
        # the later scatter (same original index) overwrites it.
        result = result.at[carry['idx']].set(carry['value'], mode='drop')
        if is_last:
            break

        # Compact the unfinished lanes to the front of the next buffer.
        active = ~carry['acc']
        pos = jnp.cumsum(active) - 1  # destination slot per active lane
        dest = jnp.where(active, pos, next_width)
        sel = jnp.full(next_width, width, jnp.int32).at[dest].set(
            jnp.arange(width, dtype=jnp.int32), mode='drop')
        valid = sel < width
        src = jnp.minimum(sel, width - 1)

        gather = lambda a: a[src]
        carry = dict(
            key=carry['key'],
            params=jax.tree_util.tree_map(gather, carry['params']),
            state=jax.tree_util.tree_map(gather, carry['state']),
            value=carry['value'][src],
            # Empty (padding) slots are marked accepted so they never
            # draw, and carry an out-of-range index so scatters drop.
            acc=~valid,
            idx=jnp.where(valid, carry['idx'][src], n).astype(jnp.int32),
            rounds=carry['rounds'],
        )

    return result, carry['rounds']
