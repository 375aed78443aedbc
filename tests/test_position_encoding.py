import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.models.position_encoding import (PositionEmbeddingLearned,
                                              build_position_encoding)


def test_learned_pos_embedding_shape():
    m = PositionEmbeddingLearned(num_pos_feats=16)
    params = m.init(jax.random.PRNGKey(0), (2, 5, 7))
    out = m.apply(params, (2, 5, 7))
    assert out.shape == (2, 5, 7, 32)
    # column embedding constant along rows, row embedding constant along cols
    o = np.asarray(out)
    assert np.allclose(o[0, 0, :, :16], o[0, 3, :, :16])
    assert np.allclose(o[0, :, 0, 16:], o[0, :, 5, 16:])


def test_build_position_encoding_sine():
    f = build_position_encoding(64, "sine")
    mask = jnp.zeros((1, 4, 4), bool)
    out = f(mask)
    assert out.shape == (1, 4, 4, 64)


def test_build_position_encoding_unknown():
    import pytest

    with pytest.raises(ValueError):
        build_position_encoding(64, "nope")
