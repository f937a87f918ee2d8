"""Pallas op tests (interpret mode on CPU; compiled path covered by the
TPU verify drives)."""

import numpy as np
import jax.numpy as jnp

from ra_slam_tpu.features.matching import hamming_matrix_popcount
from ra_slam_tpu.ops.hamming import hamming_matrix_pallas


def test_hamming_pallas_exact_interpret():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 2**32, (130, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (300, 8), dtype=np.uint32))
    d = hamming_matrix_pallas(a, b, interpret=True)
    ref = hamming_matrix_popcount(a, b)
    assert d.shape == (130, 300)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ref))


def test_hamming_pallas_identity_zero_diag():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
    d = np.asarray(hamming_matrix_pallas(a, a, interpret=True))
    assert (np.diag(d) == 0).all()
    assert (d >= 0).all() and (d <= 256).all()
