"""ops.prefix_sum: exactness across sizes/dtypes (the MXU matmul path must
be integer-exact — enforced HIGHEST matmul precision)."""

import numpy as np
import pytest

from mazu_tpu.ops.scan import prefix_sum


@pytest.mark.parametrize("n", [1, 255, 256, 4096, 12345, 1 << 18])
@pytest.mark.parametrize("hi", [2, 1000, 65536])
def test_prefix_sum_exact(n, hi):
    import jax.numpy as jnp

    rng = np.random.default_rng(n + hi)
    x = rng.integers(0, hi, n).astype(np.int32)
    want = np.cumsum(x).astype(np.int32)
    got = np.asarray(prefix_sum(jnp.asarray(x), jnp, max_value=hi))
    np.testing.assert_array_equal(want, got)
    got_ex = np.asarray(prefix_sum(jnp.asarray(x), jnp, inclusive=False, max_value=hi))
    np.testing.assert_array_equal(want - x, got_ex)
    # numpy path
    np.testing.assert_array_equal(want, prefix_sum(x, np))


@pytest.mark.parametrize("n,c,hi", [(1024, 2, 1), (2048, 3, 7), (300, 2, 1)])
def test_prefix_sum_2d_channels(n, c, hi):
    """[N, C] channel scans must equal per-column 1-D scans exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    x = rng.integers(0, hi + 1, size=(n, c)).astype(np.int32)
    want = np.cumsum(x, axis=0)
    got = np.asarray(prefix_sum(jnp.asarray(x), jnp, max_value=hi))
    np.testing.assert_array_equal(want, got)
    got_ex = np.asarray(
        prefix_sum(jnp.asarray(x), jnp, inclusive=False, max_value=hi)
    )
    np.testing.assert_array_equal(want - x, got_ex)
    np.testing.assert_array_equal(want, prefix_sum(x, np))
