"""Tests for embeddings and debug utilities."""
import numpy as np
import jax.numpy as jnp

from blindno.nn.embedding import timestep_embedding, sinusoidal_position_encoding, rotary_embedding
from blindno.utils.debug import format_tensor_size, param_count


def test_timestep_embedding_shape_and_range():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0, 1.0, 10.0]), 16))
    assert emb.shape == (3, 1, 16)
    assert np.abs(emb).max() <= 1.0 + 1e-6
    # t=0 -> cos=1, sin=0 halves
    np.testing.assert_allclose(emb[0, 0, :8], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 0, 8:], 0.0, atol=1e-6)


def test_positional_encoding_orthogonal_rows_distinct():
    pe = np.asarray(sinusoidal_position_encoding(10, 8))
    assert pe.shape == (10, 8)
    assert not np.allclose(pe[0], pe[1])


def test_rotary_preserves_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    r = rotary_embedding(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5
    )


def test_format_tensor_size():
    assert format_tensor_size(512) == "512.00 B"
    assert format_tensor_size(2048) == "2.00 KiB"
    assert format_tensor_size(3 * 1024**3) == "3.00 GiB"


def test_param_count():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros((5,))}}
    assert param_count(tree) == 17
