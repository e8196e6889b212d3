"""Worker for the 2-process jax.distributed smoke test (SURVEY §5.8).

Launched by tests/test_distributed.py as ``python tests/distributed_worker.py
<process_id> <num_processes> <port>``. Each process joins the job through
:func:`bayesbridge_tpu.parallel.distributed.initialize_multihost`, builds
the global mesh, assembles a row-sharded design with
:func:`host_local_to_global` (each process contributing only ITS rows),
runs two sharded Gibbs steps, and checks the result against an unsharded
single-process reference computed locally.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
# Cross-process CPU collectives ride gloo (jax's CPU multi-process
# backend); this is test plumbing, not a library requirement — on real
# multi-host TPU jobs the collectives ride ICI/DCN.
os.environ.setdefault('JAX_CPU_COLLECTIVES_IMPLEMENTATION', 'gloo')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from bayesbridge_tpu.parallel import distributed  # noqa: E402

# Stage markers: when the test fails on a loaded host, the last marker
# in the captured output says which phase died (import / rendezvous /
# compile / numerics) — without them a flake is undiagnosable because
# it never reproduces in isolation.
print(f'WORKER_STAGE pid={PID} imports-done', flush=True)

distributed.initialize_multihost(
    coordinator_address=f'127.0.0.1:{PORT}', num_processes=NPROC,
    process_id=PID)
assert jax.process_count() == NPROC, jax.process_count()
print(f'WORKER_STAGE pid={PID} rendezvous-done', flush=True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from bayesbridge_tpu import RegressionModel, RegressionCoefPrior  # noqa: E402
from bayesbridge_tpu import step as step_mod  # noqa: E402
from bayesbridge_tpu.gibbs_util import SamplerOptions  # noqa: E402
from bayesbridge_tpu.utils.simulate_data import (  # noqa: E402
    simulate_design, simulate_outcome,
)

N_OBS, N_PRED = 48, 12

# Every process builds the same data deterministically (the usual
# multi-host pattern: shared input pipeline, per-process row slice).
X = simulate_design(N_OBS, N_PRED, binary_frac=.8, seed=0)
beta = np.zeros(N_PRED)
beta[:3] = 1.0
outcome = simulate_outcome(X, beta, 'logit', seed=1)
model = RegressionModel(outcome, X, family='logit')
prior = RegressionCoefPrior(bridge_exponent=.5, regularizing_slab_size=2.)
options = SamplerOptions('cg')
cfg = step_mod.GibbsStepConfig(
    model, prior, options, 1, np.array([np.inf]), jnp.float64)
carry = step_mod.init_carry(
    cfg, jax.random.key(0), coef=np.zeros(model.n_pred),
    obs_prec=np.full(model.n_obs, .25), gscale=.1,
    lscale=np.ones(model.n_pred - 1))

# Unsharded local reference (runs on this process's own devices).
step = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c))
ref_carry, ref_out = step(model, carry)
ref_carry, ref_out2 = step(model, ref_carry)
ref_logp = float(ref_out2['logp'])
ref_coef = np.asarray(ref_out2['coef'])
print(f'WORKER_STAGE pid={PID} local-reference-done', flush=True)

# --- global assembly ------------------------------------------------- #
mesh = distributed.global_mesh()
assert mesh.devices.size == NPROC * 4


def replicate(x):
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, P())


def rowshard(x):
    """Each process contributes only its own contiguous row block."""
    x = np.asarray(x)
    assert x.shape[0] % NPROC == 0
    per = x.shape[0] // NPROC
    return distributed.host_local_to_global(
        x[PID * per:(PID + 1) * per], mesh)


design = model.design
assert design.backend == 'hybrid', design.backend
design.X_exact = rowshard(design.X_exact)
design.X_float = rowshard(design.X_float)
for name in ('exact_cols', 'float_cols', 'column_offset'):
    setattr(design, name, replicate(getattr(design, name)))
model.n_success = rowshard(model.n_success)
model.n_trial = rowshard(model.n_trial)
carry = jax.tree_util.tree_map(
    lambda x: x if jnp.issubdtype(x.dtype, jax.dtypes.prng_key) else
    replicate(x), carry, is_leaf=lambda x: hasattr(x, 'dtype'))
carry['key'] = jax.random.wrap_key_data(
    replicate(jax.random.key_data(carry['key'])))

step_global = jax.jit(lambda m, c: step_mod.gibbs_step(cfg, m, c),
                      out_shardings=NamedSharding(mesh, P()))
g_carry, g_out = step_global(model, carry)
g_carry, g_out2 = step_global(model, g_carry)
g_logp = float(np.asarray(g_out2['logp']))
g_coef = np.asarray(g_out2['coef'])

np.testing.assert_allclose(g_logp, ref_logp, rtol=1e-8)
np.testing.assert_allclose(g_coef, ref_coef, rtol=1e-6, atol=1e-9)

# The two processes must agree bit-for-bit (same compiled program).
agreed = multihost_utils.process_allgather(jnp.asarray(g_logp))
assert np.all(agreed == agreed[0]), agreed

print(f'WORKER_OK pid={PID} logp={g_logp:.12f}', flush=True)
