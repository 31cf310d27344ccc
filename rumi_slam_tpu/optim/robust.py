"""Robust-loss weights for iteratively-reweighted least squares."""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber loss on squared error ``chi2`` with squared
    threshold ``delta2`` (the reference uses delta = sqrt(5.991) for mono
    reprojection edges, Optimizer.cc:777)."""
    chi2 = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / chi2))


def huber_cost(chi2, delta2):
    delta = jnp.sqrt(delta2)
    e = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * e - delta2)
