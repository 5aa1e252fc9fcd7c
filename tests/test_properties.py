"""Property-based tests (hypothesis) for the numerical core."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from nerfca_tpu.ops.encoding import free_window_mask, nerfies_window
from nerfca_tpu.ops.render import depth_deltas, output_activation
from nerfca_tpu.ops.sampling import linspace_depths, sample_pdf, stratify_depths
from nerfca_tpu.ops.schedules import linear_param_decay

COMMON = dict(max_examples=25, deadline=None)


@settings(**COMMON)
@given(
    basis=st.integers(1, 16),
    step=st.integers(0, 10**6),
    decay=st.integers(1, 10**6),
    start=st.integers(0, 4),
)
def test_free_mask_bounds_and_monotone_bands(basis, step, decay, start):
    m = np.asarray(free_window_mask(basis, step, decay, start))
    assert m.shape == (basis,)
    assert (m >= 1e-8 - 1e-12).all() and (m <= 1.0).all()
    # lower bands always at least as open as higher bands
    assert (np.diff(m) <= 1e-7).all()


@settings(**COMMON)
@given(basis=st.integers(1, 16), alpha=st.floats(0, 20))
def test_nerfies_window_bounds(basis, alpha):
    w = np.asarray(nerfies_window(basis, alpha))
    assert (w >= -1e-7).all() and (w <= 1 + 1e-7).all()
    assert (np.diff(w) <= 1e-6).all()


@settings(**COMMON)
@given(
    near=st.floats(0.1, 10),
    span=st.floats(0.1, 10),
    n=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_stratified_depths_sorted_in_range(near, span, n, seed):
    z = linspace_depths(near, near + span, n)
    zr = np.asarray(stratify_depths(jax.random.PRNGKey(seed), z))
    assert (np.diff(zr) >= -1e-6).all()
    assert zr[0] >= near - 1e-5 and zr[-1] <= near + span + 1e-5


@settings(**COMMON)
@given(seed=st.integers(0, 2**31 - 1), n_samples=st.integers(1, 64))
def test_sample_pdf_within_bins(seed, n_samples):
    key = jax.random.PRNGKey(seed)
    bins = jnp.broadcast_to(jnp.linspace(2.0, 5.0, 16), (3, 16))
    w = jax.random.uniform(jax.random.fold_in(key, 1), (3, 15)) + 1e-3
    s = np.asarray(sample_pdf(key, bins, w, n_samples))
    assert s.shape == (3, n_samples)
    assert (s >= 2.0 - 1e-5).all() and (s <= 5.0 + 1e-5).all()


@settings(**COMMON)
@given(
    step=st.integers(0, 10**6),
    start=st.floats(0, 1),
    end=st.floats(0, 1),
    steps=st.integers(1, 10**6),
    delay=st.integers(0, 10**5),
)
def test_linear_decay_between_bounds(step, start, end, steps, delay):
    v = float(linear_param_decay(step, start, end, steps, delay))
    lo, hi = min(start, end, 0.0), max(start, end)
    eps = 1e-6 * max(1.0, hi)  # f32 arithmetic tolerance
    assert lo - eps <= v <= hi + eps


@settings(**COMMON)
@given(raw=st.floats(-30, 30))
def test_activations_nonnegative(raw):
    x = jnp.array([raw], jnp.float32)
    for kind in ("softplus", "sigmoid", "clamp"):
        v = float(output_activation(x, kind)[0])
        assert v >= 0.0
        assert np.isfinite(v)


@settings(**COMMON)
@given(
    n=st.integers(2, 100),
    near=st.floats(0.1, 5),
    span=st.floats(0.01, 5),
)
def test_depth_deltas_sum(n, near, span):
    z = linspace_depths(near, near + span, n)
    d = np.asarray(depth_deltas(z))
    assert d.shape == (n,)
    np.testing.assert_allclose(d[:-1].sum(), span, rtol=1e-4)
    assert d[-1] == np.float32(1e-10)
