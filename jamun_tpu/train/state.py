"""Train state + jittable train/eval steps.

Replaces PyTorch Lightning's Trainer/LightningModule plumbing
(`/root/reference/src/jamun/model/denoiser.py:299-353`) with a pure train step:
sigma sampling, noising, loss, grads, optimizer and EMA all inside one jitted
(and mesh-shardable) function. Data parallelism: shard the batch's graph axis
over the mesh "data" axis — gradient psum is inserted by the compiler.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from jamun_tpu.models.denoiser import Denoiser
from jamun_tpu.ops.graph import GraphBatch
from jamun_tpu.train.ema import ema_init, ema_update

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    rng: jax.Array


def create_train_state(denoiser: Denoiser, optimizer, example_batch: GraphBatch, seed: int = 0) -> TrainState:
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = denoiser.init(init_key, example_batch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=ema_init(params),
        rng=key,
    )


def make_train_step(
    denoiser: Denoiser,
    optimizer,
    sigma_distribution,
    ema_decay: float = 0.999,
) -> Callable[[TrainState, GraphBatch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """One optimization step. Samples ONE sigma per batch (denoiser.py:299-302)."""

    def train_step(state: TrainState, batch: GraphBatch):
        rng, sigma_key, noise_key = jax.random.split(state.rng, 3)
        sigma = sigma_distribution.sample(sigma_key)
        (loss, aux), grads = jax.value_and_grad(denoiser.training_loss, has_aux=True)(
            state.params, noise_key, batch, sigma
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_decay)
        gnorm = optax.global_norm(grads)
        aux = dict(aux, sigma=sigma, grad_norm=gnorm)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
                rng=rng,
            ),
            aux,
        )

    return train_step


def make_eval_step(denoiser: Denoiser, sigma_distribution, use_ema: bool = True):
    """Validation step (denoiser.py:321-339); uses EMA weights like the
    reference's EMA weight-swap context (`callbacks/_ema.py:283-307`)."""

    def eval_step(state: TrainState, batch: GraphBatch, key):
        sigma_key, noise_key = jax.random.split(key)
        sigma = sigma_distribution.sample(sigma_key)
        params = state.ema_params if use_ema else state.params
        per_graph, aux = denoiser.noise_and_compute_loss(
            params, noise_key, batch, sigma,
            denoiser.config.align_noisy_input_during_training,
        )
        gm = batch.graph_mask.astype(per_graph.dtype)
        denom = jnp.maximum(jnp.sum(gm), 1.0)
        aux = {k: jnp.sum(v * gm) / denom for k, v in aux.items()}
        aux["loss"] = jnp.sum(per_graph * gm) / denom
        aux["sigma"] = sigma
        return aux

    return eval_step
