"""Gating nonlinearities (NAFNet SimpleGate, Restormer gated-GELU).

XLA fuses these elementwise ops into the surrounding convs, so plain jnp is
already speed-of-light here (HBM-bandwidth bound, single pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    """NAFNet SimpleGate: split channels in half, multiply
    (NAFNet_arch.py SimpleGate)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


def gated_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Restormer GDFN gate: ``gelu(x1) * x2`` with *exact* (erf) GELU —
    torch.nn.functional.gelu default (restormer_arch.py FeedForward)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(x1, approximate=False) * x2
