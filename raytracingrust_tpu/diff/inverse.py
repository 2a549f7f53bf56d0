"""Inverse rendering: recover scene parameters from a target image.

The differentiable-rendering demo from BASELINE.json config #5 ("recover
material albedo/roughness + camera pose from target image"): Adam (optax)
over selected scene parameters against an MSE loss in linear radiance.
Per-step the gradient is computed with a fresh RNG seed (stochastic gradient
over path samples), which doubles as the Monte-Carlo estimator average.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from ..models.scene import Scene
from .grad import apply_params, extract_params, make_loss


def fit(
    scene: Scene,
    target,
    names: Iterable[str],
    width: int,
    height: int,
    *,
    steps: int = 100,
    learning_rate: float = 5e-2,
    seed: int = 0,
    resample_every: int = 1,
    callback: Callable | None = None,
    constraints: dict | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 25,
):
    """Optimize ``names`` parameters of ``scene`` to match ``target``.

    Returns (optimized scene, final params, loss history).

    ``constraints``: optional {name: (lo, hi)} clamps applied after each step
    (e.g. albedo in [0,1], fuzz >= 0).
    ``checkpoint_path``: when set, the optimizer state is periodically saved
    there and a matching existing checkpoint resumes the run mid-flight.
    """
    names = list(names)
    params = extract_params(scene, names)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    start_step = 0
    if checkpoint_path:
        from . import checkpoint as ckpt
        state = ckpt.load(checkpoint_path,
                          {"params": params, "opt": opt_state, "step": 0})
        if state is not None:
            params = jax.tree.map(jnp.asarray, state["params"])
            opt_state = jax.tree.map(jnp.asarray, state["opt"])
            start_step = int(state["step"])

    loss_fn = make_loss(scene, target, width, height, seed=seed)

    @jax.jit
    def step(params, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    history = []
    for i in range(start_step, steps):
        params, opt_state, value = step(params, opt_state)
        if constraints:
            for name, (lo, hi) in constraints.items():
                if name in params:
                    params[name] = jnp.clip(params[name], lo, hi)
        history.append(float(value))
        if callback is not None:
            callback(i, float(value), params)
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            from . import checkpoint as ckpt
            ckpt.save(checkpoint_path,
                      {"params": params, "opt": opt_state, "step": i + 1})

    return apply_params(scene, params), params, history
