"""Positional-encoding golden tests: closed-form window values and feature
layouts (reference: ``model/CPPN.py:112-162``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.ops.encoding import (
    encoded_feature_count,
    free_window_alpha,
    free_window_mask,
    make_fourier_coefficients,
    nerfies_alpha,
    nerfies_window,
    posenc,
)


def ref_free_mask(basis, step, max_iter, window_start):
    """Direct transcription of the FreeNeRF mask logic for cross-checking."""
    if step < max_iter:
        mask = np.zeros(basis)
        ptr = basis * step / max_iter + window_start
        int_ptr = int(ptr)
        mask[: int_ptr + 1] = 1.0
        mask[int_ptr : int_ptr + 1] = ptr - int_ptr
        return np.clip(mask, 1e-8, 1 - 1e-8)
    return np.ones(basis)


def test_free_window_mask_matches_reference_logic():
    basis, decay, start = 12, 150000, 1
    for step in [0, 1, 1000, 12500, 75000, 137499, 149999, 150000, 200000]:
        got = np.asarray(free_window_mask(basis, step, decay, start))
        want = ref_free_mask(basis, step, decay, start)
        np.testing.assert_allclose(got, want, atol=1e-7, err_msg=f"step={step}")


def test_free_window_mask_monotone_in_step():
    basis = 12
    prev = np.asarray(free_window_mask(basis, 0, 1000, 0))
    for step in range(100, 1100, 100):
        cur = np.asarray(free_window_mask(basis, step, 1000, 0))
        assert (cur >= prev - 1e-9).all()
        prev = cur


def test_free_window_alpha():
    a = float(free_window_alpha(12, 75000, 150000, 1))
    assert np.isclose(a, 7.0)
    assert float(free_window_alpha(12, 150000, 150000, 1)) == 13.0  # basis + 1


def test_free_window_cap_nonbinding_is_exact_reference():
    """A cap at >= basis bands never binds: the mask must follow the
    reference's exact pin-to-ones path after decay_steps instead of
    parking at the 1-1e-8 clip forever (ADVICE r3)."""
    basis, decay = 12, 1000
    for wm in (float(basis), float(basis) + 1, 100.0):
        # identical to uncapped at every step, including exact ones post-decay
        for step in (0, 500, 999, 1000, 5000):
            np.testing.assert_array_equal(
                np.asarray(free_window_mask(basis, step, decay, 1, window_max=wm)),
                np.asarray(free_window_mask(basis, step, decay, 1)),
                err_msg=f"wm={wm} step={step}",
            )
        assert (
            np.asarray(free_window_mask(basis, 2 * decay, decay, 1, window_max=wm))
            == 1.0
        ).all()
        assert float(
            free_window_alpha(basis, 2 * decay, decay, 1, window_max=wm)
        ) == basis + 1


def test_free_window_cap():
    basis, decay = 12, 1000
    # before the cap bites, capped == uncapped
    np.testing.assert_allclose(
        np.asarray(free_window_mask(basis, 100, decay, 0, window_max=4.0)),
        np.asarray(free_window_mask(basis, 100, decay, 0)),
    )
    # once ptr passes the cap, the mask freezes at the cap forever —
    # including past decay_steps (no pin-to-ones)
    at_cap = np.asarray(free_window_mask(basis, 500, decay, 0, window_max=4.0))
    for step in [600, 999, 1000, 5000]:
        got = np.asarray(free_window_mask(basis, step, decay, 0, window_max=4.0))
        np.testing.assert_allclose(got, at_cap, err_msg=f"step={step}")
    assert (at_cap[:4] > 0.9).all() and (at_cap[4:] < 1e-7).all()
    # alpha saturates too
    assert float(free_window_alpha(basis, 5000, decay, 0, window_max=4.0)) == 4.0
    # window_max=0 keeps exact reference behavior
    assert float(free_window_alpha(basis, decay, decay, 0, window_max=0.0)) == 13.0


def test_nerfies_window_closed_form():
    basis = 4
    alpha = 2.5
    got = np.asarray(nerfies_window(basis, alpha))
    x = np.clip(alpha - np.arange(basis), 0.0, 1.0)
    want = 0.5 * (1 + np.cos(np.pi * x + np.pi))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # fully-open bands -> 1, closed bands -> 0
    assert np.isclose(got[0], 1.0) and np.isclose(got[1], 1.0)
    assert np.isclose(got[3], 0.0)
    assert 0.0 < got[2] < 1.0
    assert np.isclose(float(nerfies_alpha(4, 500, 800)), 2.5)


def test_feature_counts():
    assert encoded_feature_count("none", 12) == 3
    assert encoded_feature_count("free_windowed", 12) == 3 + 3 * 2 * 12
    assert encoded_feature_count("nerfies_windowed", 8) == 3 + 3 * 2 * 8
    assert encoded_feature_count("fourier", 12) == 3 * 2 * 12
    assert encoded_feature_count("free_windowed", 0) == 3


def test_posenc_none():
    x = jnp.array([[0.1, 0.2, 0.3]])
    np.testing.assert_array_equal(np.asarray(posenc(x, "none", 12)), np.asarray(x))


def test_posenc_windowed_layout():
    """Layout: [x, band0 sin(3), band0 cos(3), band1 sin(3), ...]."""
    x = jnp.array([[0.3, -0.2, 0.7]])
    basis = 3
    out = np.asarray(posenc(x, "free_windowed", basis, window=jnp.ones(basis)))[0]
    assert out.shape == (3 + 6 * basis,)
    np.testing.assert_allclose(out[:3], [0.3, -0.2, 0.7], atol=1e-6)
    xv = np.array([0.3, -0.2, 0.7])
    for band in range(basis):
        s = 3 + band * 6
        np.testing.assert_allclose(out[s : s + 3], np.sin(xv * 2.0**band), atol=1e-6)
        np.testing.assert_allclose(
            out[s + 3 : s + 6], np.sin(xv * 2.0**band + np.pi / 2), atol=1e-6
        )


def test_posenc_window_scales_bands():
    x = jnp.array([[0.5, 0.1, -0.4]])
    basis = 4
    window = jnp.array([1.0, 0.5, 0.0, 0.0])
    full = np.asarray(posenc(x, "free_windowed", basis, window=jnp.ones(basis)))[0]
    win = np.asarray(posenc(x, "free_windowed", basis, window=window))[0]
    np.testing.assert_allclose(win[:3], full[:3])  # raw passthrough unwindowed
    np.testing.assert_allclose(win[3:9], full[3:9])  # band 0 open
    np.testing.assert_allclose(win[9:15], 0.5 * full[9:15], atol=1e-6)  # band 1 half
    np.testing.assert_allclose(win[15:], 0.0, atol=1e-7)  # bands 2,3 closed


def test_posenc_fourier():
    key = jax.random.PRNGKey(0)
    basis, sigma = 4, 2.0
    coeffs = make_fourier_coefficients(key, basis, sigma)
    assert coeffs.shape == (12,)
    x = jnp.array([[0.2, -0.1, 0.05]])
    out = np.asarray(posenc(x, "fourier", basis, fourier_coefficients=coeffs))[0]
    assert out.shape == (24,)
    tiled = np.tile(np.array([0.2, -0.1, 0.05]), basis)
    val = 2 * np.pi * tiled * np.asarray(coeffs)
    np.testing.assert_allclose(out[:12], np.sin(val), atol=1e-6)
    np.testing.assert_allclose(out[12:], np.cos(val), atol=1e-6)


def test_posenc_traces_under_jit():
    f = jax.jit(
        lambda x, step: posenc(
            x, "free_windowed", 12, window=free_window_mask(12, step, 1000, 1)
        )
    )
    out = f(jnp.ones((8, 3)), jnp.asarray(500))
    assert out.shape == (8, 75)
