"""SSIM numerics: oracle parity + boundedness on degenerate windows.

Regression for a real-TPU failure: lax.conv defaults to bf16 multiplies on
TPU, so the E[x^2]-mu^2 variance cancellation carried ~4e-3 error — larger
than the c2=9e-4 stabilizer — and per-window SSIM on a saturated render
reached -2e4, injecting loss spikes that destabilized stage-2 training.
The fix pins conv precision to HIGHEST and clamps variances at zero so the
denominator stays >= c2 for any input.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu import losses


def _ssim_oracle(img1: np.ndarray, img2: np.ndarray,
                 window_size: int = 11) -> float:
    """Direct float64 SSIM with the same SAME/zero padding semantics."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * 1.5 ** 2))
    g = g / g.sum()
    w = np.outer(g, g)
    pad = window_size // 2

    def blur(x):
        out = np.zeros_like(x)
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
        for i in range(window_size):
            for j in range(window_size):
                out += w[i, j] * xp[:, i:i + x.shape[1], j:j + x.shape[2]]
        return out

    a, b = img1.astype(np.float64), img2.astype(np.float64)
    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 ** 2
    s2 = blur(b * b) - mu2 ** 2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_matches_float64_oracle():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (3, 48, 40)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _ssim_oracle(a, b)
    assert got == pytest.approx(want, abs=2e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) == \
        pytest.approx(1.0, abs=1e-5)


def test_ssim_bounded_on_degenerate_flat_windows():
    """Near-flat pairs whose variances cancel to float noise must stay in
    [-1, 1] — the saturated-PBR-vs-white-background case from training."""
    rng = np.random.default_rng(2)
    cases = []
    # saturated flat vs flat with a faint anti-aliased edge
    a = np.ones((3, 64, 64), np.float32)
    b = np.ones((3, 64, 64), np.float32)
    b[:, 30:34, :] = 0.996
    cases.append((a, b))
    # both sides flat-with-noise at float32 resolution
    for scale in (1e-7, 1e-6, 1e-5):
        a = (1.0 + rng.normal(0, scale, (3, 64, 64))).astype(np.float32)
        b = (1.0 + rng.normal(0, scale, (3, 64, 64))).astype(np.float32)
        cases.append((a, b))
    for a, b in cases:
        v = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert -1.0 - 1e-4 <= v <= 1.0 + 1e-4, v


def test_ssim_gradient_finite_on_saturated_input():
    import jax
    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 1, (3, 48, 48)).astype(np.float32)
    sat = np.ones((3, 48, 48), np.float32)
    g = jax.grad(lambda x: losses.ssim(x, jnp.asarray(gt)))(jnp.asarray(sat))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) < 1.0
