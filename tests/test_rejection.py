"""Unit tests for the lane-compacted rejection driver.

Validates that progressive compaction and the replicated tail cannot
change what each lane computes: a deterministic stateful chain must come
back exact for every lane, and a stochastic chain's accepted values must
follow the conditional law of a single uncompacted chain.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesbridge_tpu.random.rejection import run_rejection, _plan_widths


def test_plan_widths_monotone():
    widths = _plan_widths(20_000, min_width=512, shrink=4)
    assert widths[0] == 20_000
    assert all(a > b for a, b in zip(widths, widths[1:]))
    assert widths[-1] >= 512
    assert _plan_widths(100, min_width=512, shrink=4) == [100]


def test_deterministic_state_chain_exact():
    """Lane j accepts on exactly its k_j-th attempt with value k_j; the
    driver must return k_j for every lane no matter how lanes are
    shuffled through compaction levels (and the replicated tail must not
    break stateful chains)."""
    n = 3000
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(1, 30, size=n), jnp.int32)

    def attempt(key, params, state):
        count = state['count'] + 1
        ok = count >= params['k']
        return dict(count=count), count.astype(jnp.float32), ok

    value, rounds = jax.jit(lambda key: run_rejection(
        key,
        params=dict(k=k),
        state=dict(count=jnp.zeros(n, jnp.int32)),
        attempt=attempt,
        value_init=jnp.zeros(n, jnp.float32),
        min_width=256,
    ))(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(value), np.asarray(k))
    # Tail replicas cannot make a deterministic chain finish sooner.
    assert int(rounds) >= int(k.max())


def test_accepted_values_follow_conditional_law():
    """Memoryless chain: propose u ~ U(0,1), accept iff u < p_j. The
    accepted value must be U(0, p_j); compaction/tail-replica selection
    must not bias it (an accepted value is independent of acceptance
    time)."""
    n = 4096
    p_acc = jnp.asarray(np.where(np.arange(n) % 2 == 0, 0.08, 0.9),
                        jnp.float32)

    def attempt(key, params, state):
        u = jax.random.uniform(key, params['p'].shape,
                               dtype=params['p'].dtype)
        return state, u, u < params['p']

    value, _ = jax.jit(lambda key: run_rejection(
        key,
        params=dict(p=p_acc),
        state={},
        attempt=attempt,
        value_init=jnp.zeros(n, jnp.float32),
        min_width=256,
    ))(jax.random.PRNGKey(3))
    value = np.asarray(value)
    p_np = np.asarray(p_acc)
    assert np.all(value < p_np)  # every lane accepted, below its cutoff
    # Mean of U(0, p) is p/2; check each acceptance-probability group.
    for p in (0.08, 0.9):
        group = value[p_np == p] / p  # should be U(0, 1)
        assert abs(group.mean() - 0.5) < 0.03
        assert abs(np.var(group) - 1.0 / 12.0) < 0.01


@pytest.mark.parametrize("n", [7, 300, 1500])
def test_all_lanes_accept_small_and_multilevel(n):
    def attempt(key, params, state):
        u = jax.random.uniform(key, params['p'].shape,
                               dtype=params['p'].dtype)
        return state, u + 1.0, u < params['p']

    value, _ = run_rejection(
        jax.random.PRNGKey(1),
        params=dict(p=jnp.full(n, 0.3, jnp.float32)),
        state={},
        attempt=attempt,
        value_init=jnp.zeros(n, jnp.float32),
        min_width=128,
    )
    assert np.all(np.asarray(value) >= 1.0)
