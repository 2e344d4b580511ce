"""Numerically-stable phi-domain math for sum-product BP.

phi(x) = -log(tanh(x/2)) is an involution on (0, inf); the reference computes
it in ``long double`` (``algo/bp.h:34``) and lets infinities flow. In float32
we clamp the argument: below ~1e-9 phi saturates near 21 (a "certain" LLR),
above ~31 tanh rounds to 1 and phi is exactly 0 — both ends are benign for
decoding and keep the kernel free of inf/nan.
"""
from __future__ import annotations

import jax.numpy as jnp

PHI_ARG_MIN = 1e-9
PHI_ARG_MAX = 31.0

__all__ = ["phi", "PHI_ARG_MIN", "PHI_ARG_MAX"]


def phi(x):
    x = jnp.clip(x, PHI_ARG_MIN, PHI_ARG_MAX)
    return -jnp.log(jnp.tanh(0.5 * x))
