"""Embarrassingly-parallel MCMC: independent Gibbs chains under ``vmap``.

The reference is strictly single-chain — ``gibbs`` is one sequential
Python loop (reference: bayesbridge/bayesbridge.py:210) — so users run
replicate chains as separate processes. On TPU the idiomatic equivalent
is to vectorize the whole chain: the jitted Gibbs step is a pure
function of its carry, so ``jax.vmap`` turns it into an ``n_chains``-wide
step at compile time, and a ``jax.sharding.Mesh`` placement of the chain
axis runs chains on separate devices with zero code changes (XLA/GSPMD
partitions the batched program; chains never communicate, so no
collectives are inserted on the hot path).

All chains share the deterministic initialization (the reference's
semantics for a fixed ``init``); they differ only through their PRNG
keys, split once from the seed. Cross-chain diagnostics (split R-hat,
pooled ESS) live in :mod:`bayesbridge_tpu.utils.mcmc_summarizer`.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .gibbs_util import SamplerOptions
from . import step as step_mod


def gibbs_chains(bridge, n_iter, n_chains, n_burnin=0, thin=1, seed=None,
                 init=None, params_to_save=('coef', 'global_scale', 'logp'),
                 coef_sampler_type=None, options=None, mesh=None,
                 chain_axis='chains'):
    """Run `n_chains` independent Gibbs chains in one compiled program.

    Parameters mirror ``BayesBridge.gibbs``; additionally:

    mesh : optional jax.sharding.Mesh
        If given, the chain axis is sharded over ``mesh[chain_axis]``
        (data-parallel chains; the model is replicated on every device).

    Returns
    -------
    (samples, info) : samples[key] has shape (n_chains, ..., n_kept);
        info carries per-chain sampling statistics plus the guard-rail
        counters summed over chains.
    """
    if not isinstance(options, SamplerOptions):
        options = SamplerOptions.pick_default_and_create(
            coef_sampler_type, options, bridge.model.name,
            bridge.model.design)
    if init is None:
        init = {'global_scale': 0.1}
    if params_to_save == 'all':
        params_to_save = ('coef', 'local_scale', 'global_scale', 'logp')
        if bridge.model.name != 'cox':
            params_to_save += ('obs_prec',)
    from .bridge import _SAVABLE_PARAMS
    unknown = [k for k in params_to_save if k not in _SAVABLE_PARAMS]
    if unknown:
        raise ValueError(
            "Unknown parameter name(s) {} in params_to_save.".format(
                unknown))

    bridge.rg.set_seed(seed)
    cfg = bridge._get_step_config(options)
    coef, obs_prec, lscale, gscale, init, _ = bridge.initialize_chain(
        init, bridge.prior.bridge_exp, cfg)

    # Advance the generator past the split so later direct draws from
    # bridge.rg never reuse a chain's key (mirrors the single-chain
    # path's key hand-back after the scan).
    keys = jax.random.split(bridge.rg.key, n_chains + 1)
    bridge.rg._key = keys[-1]
    keys = keys[:n_chains]
    carry0 = step_mod.init_carry(cfg, keys[0], coef, obs_prec, gscale,
                                 lscale)
    carry = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), carry0)
    carry['key'] = keys

    model = bridge.model
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        chain_sharding = lambda x: NamedSharding(
            mesh, P(chain_axis, *([None] * (x.ndim - 1))))
        carry = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, chain_sharding(x)), carry)
        model = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), model)

    n_sample = (n_iter - n_burnin) // thin
    n_remainder = (n_iter - n_burnin) - n_sample * thin

    def _run(model, carry):
        return step_mod.run_chain(
            cfg, model, carry, n_burnin, n_sample, thin, n_remainder,
            save_keys=tuple(params_to_save), status_interval=0)

    carry, outputs = jax.jit(jax.vmap(_run, in_axes=(None, 0)))(
        model, carry)
    carry_host, outputs = jax.device_get(
        ({k: v for k, v in carry.items() if k != 'key'}, outputs))

    # outputs leaves: (n_chains, n_kept, ...) -> (n_chains, ..., n_kept)
    samples = {}
    for key in params_to_save:
        if key in outputs:
            samples[key] = np.moveaxis(np.array(outputs[key]), 1, -1)

    # Report scales in the user-facing parametrization, exactly like
    # BayesBridge.gibbs (bridge.py; reference bayesbridge.py:244-254).
    gscale_final = np.array(carry_host['gscale'], dtype=np.float64)
    lscale_final = np.array(carry_host['lscale'], dtype=np.float64)
    if bridge.prior._gscale_paramet == 'coef_magnitude':
        gscale_final, lscale_final = bridge.prior.adjust_scale(
            gscale_final, lscale_final, to='coef_magnitude')
        bridge.prior.adjust_scale(
            samples.get('global_scale', np.zeros(0)),
            samples.get('local_scale', np.zeros(0)),
            to='coef_magnitude')

    sampling_info = {
        key: np.asarray(outputs[key], dtype=np.float64)
        for key in bridge.manager.get_sampling_info_keys(
            options.coef_sampler_type)
        if key in outputs
    }
    info = {
        'n_iter': n_iter, 'n_burnin': n_burnin, 'thin': thin,
        'n_chains': n_chains, 'seed': seed,
        'coef_sampler_type': options.coef_sampler_type,
        '_reg_coef_sampling_info': sampling_info,
        '_final_state': {
            'coef': carry_host['coef'],
            'global_scale': gscale_final,
            'local_scale': lscale_final,
            'obs_prec': carry_host['obs_prec'],
        },
    }
    for counter in ('n_gscale_clamped', 'n_lscale_underflow',
                    'n_lscale_overflow', 'n_cg_unconverged'):
        if counter in carry_host:
            info[counter] = int(np.sum(carry_host[counter]))
    # Surface the same numerical guard-rail warnings as the single-chain
    # path (summed over chains).
    bridge._warn_guard_rails(
        {k: np.sum(v) for k, v in carry_host.items()
         if k.startswith('n_')}, options)
    return samples, info
