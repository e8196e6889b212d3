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

Chains can share one deterministic initialization (the reference's
semantics for a fixed ``init``) or take PER-CHAIN inits — pass a
sequence of init dicts for the overdispersed starting points that make
split-R-hat meaningful. ``gibbs_chains_resume`` continues all chains
from their exact final states (same carry-is-the-checkpoint contract as
the single-chain ``gibbs_resume``). Cross-chain diagnostics (split
R-hat, pooled ESS) live in :mod:`bayesbridge_tpu.utils.mcmc_summarizer`.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .gibbs_util import SamplerOptions
from . import step as step_mod


@partial(jax.jit, static_argnames=('cfg', 'n_burnin', 'n_sample', 'thin',
                                   'n_remainder', 'save_keys'))
def _run_chains(cfg, model, carry, n_burnin, n_sample, thin, n_remainder,
                save_keys):
    """vmapped multi-chain scan. Module-level jit so the (large) vmapped
    program compiles once per (cfg, shape) combination and is reused by
    every ``gibbs_chains`` / ``gibbs_chains_resume`` call — a fresh
    closure per call would recompile each time.

    The matmul-precision context: vmap batches every design matvec
    into an n_chains-wide dot, and wide f32 dots at DEFAULT precision
    chain their MXU partials through bf16 on TPU — measured 2.4e-3
    rel err per matvec where the single-chain width-1 emitter is
    f32-accurate (1.3e-7). 'float32' restores the f32 decomposition
    for every dot traced under the vmap (the chains' CG operators,
    Grams, and link products) at unchanged HBM traffic."""
    with jax.default_matmul_precision('float32'):
        return jax.vmap(
            lambda c: step_mod.run_chain(
                cfg, model, c, n_burnin, n_sample, thin, n_remainder,
                save_keys=save_keys, status_interval=0)
        )(carry)


def _stack_chain_inits(bridge, init, n_chains, cfg):
    """Resolve shared-or-per-chain inits into stacked start arrays.

    A single (possibly partial) init dict resolves ONCE and the result
    is broadcast, so every chain starts from the same state even when
    `initialize_chain` has to draw unspecified parameters or run the MAP
    search — both for the documented semantics and to avoid repeating a
    potentially minutes-long optimization n_chains times. Per-chain
    (overdispersed) starts require an explicit sequence of dicts.
    """
    if isinstance(init, dict) or init is None:
        shared = bridge.initialize_chain(
            dict(init) if init else {'global_scale': 0.1},
            bridge.prior.bridge_exp, cfg)[:4]
        starts = [shared] * n_chains
    elif len(init) != n_chains:
        raise ValueError(
            f"Got {len(init)} init dicts for {n_chains} chains.")
    else:
        starts = [bridge.initialize_chain(
            dict(one), bridge.prior.bridge_exp, cfg)[:4] for one in init]

    def stack(i):
        return np.stack([
            np.asarray(s[i] if s[i] is not None else np.zeros(0),
                       dtype=np.float64) for s in starts])

    return stack(0), stack(1), stack(2), stack(3)


def _assemble(bridge, options, params_to_save, carry, outputs,
              base_info):
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
        **base_info,
        'coef_sampler_type': options.coef_sampler_type,
        'saved_params': tuple(params_to_save),
        'options': options.get_info(),
        '_reg_coef_sampling_info': sampling_info,
        '_final_state': {
            'coef': carry_host['coef'],
            'global_scale': gscale_final,
            'local_scale': lscale_final,
            'obs_prec': carry_host['obs_prec'],
        },
        # Exact resume state: the full vmapped carry (raw scales) plus
        # the PRNG keys, mirroring the single-chain checkpoint contract.
        '_chain_carry': jax.tree_util.tree_map(
            np.asarray, carry_host),
        '_chain_keys': np.asarray(jax.random.key_data(carry['key'])),
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


def _execute(bridge, cfg, carry, n_iter, n_burnin, thin, params_to_save,
             options, mesh, chain_axis):
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
    return _run_chains(cfg, model, carry, n_burnin, n_sample, thin,
                       n_remainder, tuple(params_to_save))


def _resolve_options(bridge, coef_sampler_type, options):
    if not isinstance(options, SamplerOptions):
        options = SamplerOptions.pick_default_and_create(
            coef_sampler_type, options, bridge.model.name,
            bridge.model.design)
    return options


def _resolve_params_to_save(bridge, params_to_save):
    from .bridge import resolve_params_to_save
    return resolve_params_to_save(bridge.model.name, params_to_save)


def gibbs_chains(bridge, n_iter, n_chains, n_burnin=0, thin=1, seed=None,
                 init=None, params_to_save=('coef', 'global_scale', 'logp'),
                 coef_sampler_type=None, options=None, mesh=None,
                 chain_axis='chains'):
    """Run `n_chains` independent Gibbs chains in one compiled program.

    Parameters mirror ``BayesBridge.gibbs``; additionally:

    init : dict, or sequence of n_chains dicts
        One dict starts every chain from the same state (they diverge
        only through their PRNG streams); a sequence gives each chain
        its own (overdispersed) start. For convergence diagnostics
        (split R-hat, pooled ESS) prefer a sequence of overdispersed
        starts — identical starts can leave a shared basin of a
        multimodal posterior undetected (see
        ``examples/multichain_rhat.py``).
    mesh : optional jax.sharding.Mesh
        If given, the chain axis is sharded over ``mesh[chain_axis]``
        (data-parallel chains; the model is replicated on every device).

    Returns
    -------
    (samples, info) : samples[key] has shape (n_chains, ..., n_kept);
        info carries per-chain sampling statistics, the guard-rail
        counters summed over chains, and the exact per-chain resume
        state consumed by ``gibbs_chains_resume``.
    """
    options = _resolve_options(bridge, coef_sampler_type, options)
    params_to_save = _resolve_params_to_save(bridge, params_to_save)

    bridge.rg.set_seed(seed)
    cfg = bridge._get_step_config(options)
    coef, obs_prec, lscale, gscale = _stack_chain_inits(
        bridge, init, n_chains, cfg)

    # Advance the generator past the split so later direct draws from
    # bridge.rg never reuse a chain's key (mirrors the single-chain
    # path's key hand-back after the scan).
    keys = jax.random.split(bridge.rg.key, n_chains + 1)
    bridge.rg._key = keys[-1]
    carry = jax.vmap(
        lambda key, c, o, g, l: step_mod.init_carry(cfg, key, c, o, g, l)
    )(keys[:n_chains], coef, obs_prec, gscale, lscale)

    carry, outputs = _execute(
        bridge, cfg, carry, n_iter, n_burnin, thin, params_to_save,
        options, mesh, chain_axis)
    base_info = {'n_iter': n_iter, 'n_burnin': n_burnin, 'thin': thin,
                 'n_chains': n_chains, 'seed': seed}
    return _assemble(bridge, options, params_to_save, carry, outputs,
                     base_info)


def gibbs_chains_resume(bridge, prev_info, n_add_iter, merge=False,
                        prev_samples=None, mesh=None,
                        chain_axis='chains'):
    """Continue every chain from its exact final state.

    With ``merge=True`` (requires `prev_samples`) the returned samples
    are the previous and new draws concatenated along the iteration
    axis; the continuation is bit-identical to having run the longer
    chains uninterrupted.
    """
    if merge and prev_samples is None:
        raise ValueError(
            "To merge the outputs from previous and new MCMC runs, "
            "supply the optional argument `prev_samples`.")
    options = SamplerOptions(**prev_info['options'])
    params_to_save = prev_info['saved_params']
    cfg = bridge._get_step_config(options)

    carry = jax.tree_util.tree_map(jnp.asarray,
                                   dict(prev_info['_chain_carry']))
    carry['key'] = jax.random.wrap_key_data(
        jnp.asarray(prev_info['_chain_keys']))
    n_chains = prev_info['n_chains']
    thin = prev_info['thin']

    carry, outputs = _execute(
        bridge, cfg, carry, n_add_iter, 0, thin, params_to_save,
        options, mesh, chain_axis)
    base_info = {'n_iter': n_add_iter, 'n_burnin': 0, 'thin': thin,
                 'n_chains': n_chains, 'seed': prev_info.get('seed')}
    samples, info = _assemble(bridge, options, params_to_save, carry,
                              outputs, base_info)
    if merge:
        for key in samples:
            samples[key] = np.concatenate(
                (prev_samples[key], samples[key]), axis=-1)
        info['n_iter'] += prev_info['n_iter']
        merged_si = {}
        for key, val in info['_reg_coef_sampling_info'].items():
            prev_val = prev_info['_reg_coef_sampling_info'].get(key)
            merged_si[key] = val if prev_val is None else \
                np.concatenate((prev_val, val), axis=1)
        info['_reg_coef_sampling_info'] = merged_si
    return samples, info
