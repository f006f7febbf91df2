"""Hinge GAN losses (SURVEY.md §2.9).

L_D = E[relu(1 − D(real))] + E[relu(1 + D(fake))], summed over DS and DT;
L_G = −E[DS(fake) + DT(fake)]. No gradient penalty. All in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_hinge(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    real_scores = real_scores.astype(jnp.float32)
    fake_scores = fake_scores.astype(jnp.float32)
    return (jax.nn.relu(1.0 - real_scores).mean()
            + jax.nn.relu(1.0 + fake_scores).mean())


def g_hinge(fake_scores: jax.Array) -> jax.Array:
    return -fake_scores.astype(jnp.float32).mean()
