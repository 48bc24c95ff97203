"""Flash-attention kernel vs einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.ops.flash_attention import attention_reference, flash_attention


@pytest.mark.parametrize("G,Lq,Lk,d", [
    (4, 16, 300, 64),      # unaligned kv length
    (2, 7, 1024, 16),      # small head dim (BiST d_k=16), unaligned q
    (1, 128, 2048, 128),   # aligned large
])
def test_flash_matches_reference(G, Lq, Lk, d, rng):
    q = rng.standard_normal((G, Lq, d)).astype(np.float32)
    k = rng.standard_normal((G, Lk, d)).astype(np.float32)
    v = rng.standard_normal((G, Lk, d)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          interpret=True)
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_with_mask(rng):
    G, Lq, Lk, d = 3, 8, 640, 32
    q = rng.standard_normal((G, Lq, d)).astype(np.float32)
    k = rng.standard_normal((G, Lk, d)).astype(np.float32)
    v = rng.standard_normal((G, Lk, d)).astype(np.float32)
    mask = (rng.uniform(size=(G, Lk)) > 0.3).astype(np.int32)
    mask[:, 0] = 1  # keep at least one valid position per row
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(mask), interpret=True)
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
