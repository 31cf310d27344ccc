"""Pyramidal LK optical flow (reference KFDSample's calcOpticalFlowPyrLK)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.ops import optical_flow


def _textured(h=120, w=160, seed=0):
    """Non-periodic smooth texture (periodic patterns alias large shifts)."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(
        rng.uniform(0, 255, (h, w)), sigma=2.0, mode="wrap"
    )
    lo, hi = img.min(), img.max()
    return (255.0 * (img - lo) / (hi - lo)).astype(np.float32)


@pytest.mark.parametrize("shift", [(3, 2), (-4, 1), (6, -5)])
def test_lk_recovers_translation(shift):
    dx, dy = shift
    img = _textured()
    cur = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        rng.uniform([20, 20], [140, 100], size=(40, 2)), jnp.float32
    )
    valid = jnp.ones(40, bool)
    flow, ok = optical_flow.lk_flow(
        jnp.asarray(img), jnp.asarray(cur), pts, valid
    )
    est = np.asarray(flow)[np.asarray(ok)]
    assert len(est) > 15
    med = np.median(est, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.7)


def test_mean_flow_magnitude():
    img = _textured(seed=2)
    cur = np.roll(img, 5, axis=1)  # 5px horizontal shift
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform([20, 20], [140, 100], (40, 2)), jnp.float32)
    mag = float(optical_flow.mean_flow_magnitude(
        jnp.asarray(img), jnp.asarray(cur), pts, jnp.ones(40, bool)))
    assert 3.0 < mag < 7.0
    # identical frames -> ~zero flow
    mag0 = float(optical_flow.mean_flow_magnitude(
        jnp.asarray(img), jnp.asarray(img), pts, jnp.ones(40, bool)))
    assert mag0 < 0.5
