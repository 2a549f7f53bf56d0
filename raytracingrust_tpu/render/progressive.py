"""Progressive (accumulating) rendering.

The reference's interactive mode re-renders the whole frame from scratch on
every edit and blocks the UI while doing it (src/gui.rs:324-337, SURVEY.md
section 3.2) — there is no accumulation.  Here samples accumulate across
passes: each pass traces ``spp_per_pass`` fresh samples per pixel (seeded by
the global pass index, so no sample is ever reused), the running mean
converges like 1/sqrt(total spp), intermediate PNGs can be written, and the
accumulator is checkpointable for restart (SURVEY.md section 5 failure-
recovery bullet).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from ..models.scene import Scene
from ..utils import color as color_mod
from .render import render_linear


@dataclasses.dataclass
class Accumulator:
    radiance_sum: np.ndarray  # (H, W, 3) sum of per-pass mean radiance
    passes: int = 0

    @property
    def mean(self) -> np.ndarray:
        return self.radiance_sum / max(self.passes, 1)

    def rgba8(self) -> np.ndarray:
        gamma = np.sqrt(np.maximum(self.mean, 0.0))
        return color_mod.np_to_rgba8(gamma)


def render_progressive(
    scene: Scene,
    width: int,
    height: int,
    *,
    passes: int = 8,
    spp_per_pass: int | None = None,
    seed: int = 0,
    checkpoint_path: str | None = None,
    on_pass: Callable | None = None,
) -> Accumulator:
    """Accumulate ``passes`` independent renders -> Accumulator.

    Every pass uses the scene's samples_per_pixel (or ``spp_per_pass``) and a
    distinct RNG stream; pass results are equal-weight averaged, which is
    exactly an spp*passes render.  ``on_pass(acc, i)`` fires after each pass
    (write a preview PNG, log variance, ...).
    """
    if spp_per_pass is not None:
        scene = dataclasses.replace(
            scene,
            settings=dataclasses.replace(
                scene.settings, samples_per_pixel=spp_per_pass
            ),
        )

    acc = Accumulator(np.zeros((height, width, 3), np.float32))
    if checkpoint_path:
        from ..diff import checkpoint as ckpt
        state = ckpt.load(
            checkpoint_path,
            {"sum": acc.radiance_sum, "passes": 0, "seed": 0},
        )
        if state is not None and int(state["seed"]) == seed:
            acc = Accumulator(np.asarray(state["sum"]), int(state["passes"]))

    for i in range(acc.passes, passes):
        # pass i draws rays keyed by (seed, pass) -> fresh, reproducible
        img = np.asarray(
            render_linear(scene, width, height, seed=seed * 1_000_003 + i)
        )
        acc.radiance_sum = acc.radiance_sum + img
        acc.passes = i + 1
        if checkpoint_path:
            from ..diff import checkpoint as ckpt
            ckpt.save(checkpoint_path,
                      {"sum": acc.radiance_sum, "passes": acc.passes,
                       "seed": seed})
        if on_pass is not None:
            on_pass(acc, i)
    return acc
