"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The sharded Gibbs step must produce the SAME numbers as the unsharded
one (GSPMD only changes placement/collectives), and sharded arrays must
actually be distributed across the mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesbridge_tpu import RegressionModel, RegressionCoefPrior
from bayesbridge_tpu.gibbs_util import SamplerOptions
from bayesbridge_tpu import step as step_mod
from bayesbridge_tpu.parallel import make_mesh, shard_model
from bayesbridge_tpu.utils.simulate_data import (
    simulate_design, simulate_outcome,
)

N_DEV = 8


def _build(n_obs=64, n_pred=24, family='logit', backend=None):
    X = simulate_design(n_obs, n_pred, binary_frac=.8, seed=0)
    beta = np.zeros(n_pred)
    beta[:3] = 1.0
    outcome = simulate_outcome(X, beta, family, seed=1)
    model = RegressionModel(outcome, X, family=family)
    if backend is not None:
        from bayesbridge_tpu.design import SparseDesignMatrix
        model.design = SparseDesignMatrix(
            X, add_intercept=True, center_predictor=True, backend=backend)
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    options = SamplerOptions('cg')
    cfg = step_mod.GibbsStepConfig(
        model, prior, options, 1, np.array([np.inf]), jnp.float64)
    carry = step_mod.init_carry(
        cfg, jax.random.key(0),
        coef=np.zeros(model.n_pred),
        obs_prec=np.full(model.n_obs, .25),
        gscale=.1, lscale=np.ones(model.n_pred - 1))
    return model, cfg, carry


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
@pytest.mark.parametrize("backend", ['hybrid', 'ell'])
def test_sharded_step_matches_unsharded(backend):
    model, cfg, carry = _build(backend=backend)
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    if backend == 'hybrid':
        sharding = model.design.X_exact.sharding
        assert len(sharding.device_set) == N_DEV
    sh_carry, sh_out = step(model, carry)

    # Sharding reorders reductions; f64 round-off enters the CG stopping
    # rule, so solver outputs agree to solver tolerance, not ulps.
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref_carry['lscale']), np.asarray(sh_carry['lscale']),
        rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_2d_obs_pred_sharding_matches_unsharded(mesh_shape):
    """Column-sharding of the hybrid blocks (SURVEY §5.7): an
    (obs x pred) mesh must reproduce the unsharded Gibbs step."""
    from bayesbridge_tpu.parallel import PRED_AXIS
    model, cfg, carry = _build(backend='hybrid')
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(mesh_shape)
    shard_model(model, mesh, pred_axis=PRED_AXIS)
    assert len(model.design.X_exact.sharding.device_set) == N_DEV
    sh_carry, sh_out = step(model, carry)

    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
def test_2d_sharding_ell_backend():
    from bayesbridge_tpu.parallel import PRED_AXIS
    model, cfg, carry = _build(backend='ell')
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)
    shard_model(model, make_mesh((4, 2)), pred_axis=PRED_AXIS)
    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
@pytest.mark.parametrize("backend", ['hybrid', 'ell'])
def test_uneven_obs_axis_pads_and_shards(backend):
    """An observation count that does not divide the mesh must be
    zero-padded and GENUINELY distributed (not silently replicated),
    with products unchanged (VERDICT r2 weak #1)."""
    model, cfg, carry = _build(n_obs=100, n_pred=23, backend=backend)
    design = model.design
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(design.shape[1]))
    u = jnp.asarray(rng.standard_normal(design.shape[0]))
    w = jnp.asarray(rng.random(design.shape[0]) + .5)
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))
    ref_diag = np.asarray(design.compute_fisher_diag(w))
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    big = design.X_exact if backend == 'hybrid' else design.row_idx
    assert big.shape[0] == 104  # padded to the mesh
    assert len(big.sharding.device_set) == N_DEV
    shard_shapes = {s.data.shape for s in big.addressable_shards}
    assert shard_shapes == {(104 // N_DEV,) + big.shape[1:]}

    np.testing.assert_allclose(np.asarray(design.dot(v)), ref_dot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(design.Tdot(u)), ref_tdot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(design.compute_fisher_diag(w)),
                               ref_diag, rtol=1e-8, atol=1e-10)
    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
def test_uneven_2d_mesh_pads_both_axes():
    """Uneven rows AND columns pad to a 2-d mesh and stay exact."""
    from bayesbridge_tpu.parallel import PRED_AXIS
    model, cfg, carry = _build(n_obs=100, n_pred=23, backend='hybrid')
    design = model.design
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal(design.shape[1]))
    u = jnp.asarray(rng.standard_normal(design.shape[0]))
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))
    shard_model(model, make_mesh((4, 2)), pred_axis=PRED_AXIS)
    assert design.X_exact.shape[0] == 100 + (-100 % 4)
    assert design.X_exact.shape[1] % 2 == 0
    assert len(design.X_exact.sharding.device_set) == N_DEV
    np.testing.assert_allclose(np.asarray(design.dot(v)), ref_dot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(design.Tdot(u)), ref_tdot,
                               rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_place_model_commits_every_leaf():
    """place_model must COMMIT all model arrays to one device so jitted
    calls never re-upload them (remote-attached runtimes re-transfer
    uncommitted host arrays on every call), and the placed model must
    reproduce the un-placed Gibbs step exactly."""
    from bayesbridge_tpu.parallel import place_model
    model, cfg, carry = _build()
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    dev = jax.devices()[-1]
    placed = place_model(model, dev)
    leaves = jax.tree_util.tree_leaves(placed)
    assert leaves, "model flattened to no arrays"
    for leaf in leaves:
        assert leaf.committed, "leaf left uncommitted"
        assert leaf.devices() == {dev}
    pl_carry, pl_out = step(placed, carry)
    np.testing.assert_array_equal(np.asarray(ref_out['coef']),
                                  np.asarray(pl_out['coef']))


def test_multihost_entry_is_noop_single_process():
    """initialize_multihost must be safe (and a no-op) in-process."""
    from bayesbridge_tpu.parallel import distributed
    distributed.initialize_multihost()
    assert jax.process_count() == 1
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    if len(jax.devices()) >= 2:  # single-chip backends can't 2-d split
        mesh2 = distributed.global_mesh(pred_shards=2)
        assert mesh2.axis_names == ('shard', 'pred')
        assert mesh2.devices.shape == (len(jax.devices()) // 2, 2)


@pytest.mark.slow  # ~23 s: full sharded chain; the 2-d mesh and
# fused-under-shard_map variants stay in the fast lane.
@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
def test_sharded_full_chain_runs():
    model, cfg, carry = _build(family='linear')
    carry['obs_prec'] = jnp.asarray(1.0, jnp.float64)
    shard_model(model, make_mesh(N_DEV))
    carry, outputs = step_mod.run_chain(
        cfg, model, carry, n_burnin=2, n_sample=3, thin=2, n_remainder=0,
        save_keys=('coef', 'logp'))
    assert outputs['coef'].shape[0] == 3
    assert np.all(np.isfinite(np.asarray(outputs['logp'])))


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_bitpack_2d_pred_axis_sharding(mesh_shape):
    """2-d (obs x pred) sharding of the dual bitmaps (SURVEY §5.7 /
    VERDICT r2 item 7): per-shard LUTs over the predictor byte-groups
    must reproduce the unsharded products and Gibbs step."""
    from bayesbridge_tpu.parallel import PRED_AXIS
    model, cfg, carry = _build(n_obs=96, n_pred=40, backend='bitpack')
    design = model.design
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.standard_normal(design.shape[1]))
    u = jnp.asarray(rng.standard_normal(design.shape[0]))
    w = jnp.asarray(rng.random(design.shape[0]) + .5)
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))
    ref_diag = np.asarray(design.compute_fisher_diag(w))
    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(mesh_shape)
    shard_model(model, mesh, pred_axis=PRED_AXIS)
    assert design._bitpack_shard[2] == PRED_AXIS
    assert len(design.bits_col.sharding.device_set) == N_DEV

    np.testing.assert_allclose(np.asarray(design.dot(v)), ref_dot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(design.Tdot(u)), ref_tdot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(design.compute_fisher_diag(w)),
                               ref_diag, rtol=1e-8, atol=1e-10)
    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
def test_bitpack_backend_shards_over_mesh():
    """The bitpacked bitmaps shard along observations via shard_map and
    must reproduce the unsharded products and Gibbs step."""
    model, cfg, carry = _build(backend='bitpack')
    design = model.design
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(design.shape[1]))
    u = jnp.asarray(rng.standard_normal(design.shape[0]))
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))

    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    assert model.design._bitpack_shard is not None
    assert len(model.design.bits_row.sharding.device_set) == N_DEV

    np.testing.assert_allclose(np.asarray(model.design.dot(v)), ref_dot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(model.design.Tdot(u)),
                               ref_tdot, rtol=1e-8, atol=1e-10)

    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
@pytest.mark.parametrize("n_obs", [64, 100])  # 100: uneven row blocks
def test_winell_backend_shards_over_mesh(n_obs):
    """The windowed-ELL backend re-packs per-device observation blocks
    under shard_map and must reproduce the unsharded products, Fisher
    diagonal, and Gibbs step (even when n_obs does not divide the mesh)."""
    import scipy.sparse as sps
    from bayesbridge_tpu.design import SparseDesignMatrix

    n_pred = 24
    rng = np.random.default_rng(5)
    dense = ((rng.random((n_obs, n_pred)) < 0.15)
             * rng.poisson(3.0, (n_obs, n_pred))).astype(np.float64)
    dense[:, 0] += 1.0  # keep every column informative
    X = sps.csr_matrix(dense)
    beta = np.zeros(n_pred)
    beta[:3] = .5
    outcome = simulate_outcome(X, beta, 'logit', seed=1)
    model = RegressionModel(outcome, X, family='logit')
    model.design = SparseDesignMatrix(
        X, add_intercept=True, center_predictor=True,
        backend='winell', dtype=np.float32)
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    options = SamplerOptions('cg')
    cfg = step_mod.GibbsStepConfig(
        model, prior, options, 1, np.array([np.inf]), jnp.float64)
    carry = step_mod.init_carry(
        cfg, jax.random.key(0),
        coef=np.zeros(model.n_pred),
        obs_prec=np.full(model.n_obs, .25),
        gscale=.1, lscale=np.ones(model.n_pred - 1))

    design = model.design
    v = jnp.asarray(rng.standard_normal(design.shape[1]),
                    dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal(design.shape[0]),
                    dtype=jnp.float32)
    w = jnp.asarray(rng.random(design.shape[0]), dtype=jnp.float32)
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))
    ref_fdiag = np.asarray(design.compute_fisher_diag(w))

    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    assert model.design._winell_shard is not None
    assert len(model.design.widx_dot.sharding.device_set) == N_DEV
    assert model.design.widx_dot.ndim == 3

    np.testing.assert_allclose(np.asarray(model.design.dot(v)), ref_dot,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.design.Tdot(u)),
                               ref_tdot, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.design.compute_fisher_diag(w)), ref_fdiag,
        rtol=1e-5, atol=1e-6)

    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < N_DEV,
                    reason="needs the 8-device CPU mesh")
@pytest.mark.slow
def test_bitpack_uneven_obs_pads_float_block():
    """On an uneven observation count the bitpack backend's float block
    must be zero-padded to the mesh and actually row-sharded — NOT
    silently replicated on every device (at bitpack scale the f32 float
    block can dominate per-device memory)."""
    from jax.sharding import PartitionSpec as P
    model, cfg, carry = _build(n_obs=100, backend='bitpack')
    design = model.design
    assert design.float_cols.size, "test needs float columns"
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(design.shape[1]))
    u = jnp.asarray(rng.standard_normal(design.shape[0]))
    w = jnp.asarray(rng.random(design.shape[0]))
    ref_dot = np.asarray(design.dot(v))
    ref_tdot = np.asarray(design.Tdot(u))
    ref_fdiag = np.asarray(design.compute_fisher_diag(w))
    ref_dense = np.asarray(design.toarray())

    step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
    ref_carry, ref_out = step(model, carry)

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    Xf = model.design.X_float
    assert Xf.shape[0] % N_DEV == 0 and Xf.shape[0] >= 100
    spec = Xf.sharding.spec
    assert spec[0] is not None, f"float block replicated: {spec}"

    np.testing.assert_allclose(np.asarray(model.design.dot(v)), ref_dot,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(model.design.Tdot(u)),
                               ref_tdot, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(model.design.compute_fisher_diag(w)), ref_fdiag,
        rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(model.design.toarray()),
                               ref_dense, rtol=1e-7, atol=1e-9)

    sh_carry, sh_out = step(model, carry)
    np.testing.assert_allclose(
        np.asarray(ref_out['coef']), np.asarray(sh_out['coef']),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_out['logp']), float(sh_out['logp']), rtol=1e-6)
