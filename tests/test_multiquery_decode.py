"""Multi-query (speculative-span) paged decode vs per-position oracle.

q_span > 1 decodes a short run of tail positions in one kernel pass — the
verification primitive for speculative decoding / MTP. Row si of the span
is exactly a seqlen_q=1 decode at effective length len - (span-1-si), which
is the oracle used here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.paged import paged_attention
from mfa_tpu.ref.oracle import paged_decode_ref
from tests.utils import assert_close


def _setup(batch, heads, kv_heads, d, page, pps, key=0):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    num_pages = batch * pps + 1
    q = None
    k_pages = jax.random.normal(kk, (kv_heads, num_pages, page, d), jnp.float32)
    v_pages = jax.random.normal(kv, (kv_heads, num_pages, page, d), jnp.float32)
    table = (
        jax.random.permutation(jax.random.key(key + 1), num_pages - 1)[
            : batch * pps
        ]
        + 1
    ).reshape(batch, pps).astype(jnp.int32)
    return kq, k_pages, v_pages, table


@pytest.mark.parametrize("span,group", [(4, 1), (4, 2), (3, 4), (8, 2)])
def test_multiquery_paged_decode(span, group):
    batch, kv_heads, d = 2, 2, 64
    heads = kv_heads * group
    page, pps = 64, 4
    kq, k_pages, v_pages, table = _setup(batch, heads, kv_heads, d, page, pps)
    q = jax.random.normal(kq, (batch, span, heads, d), jnp.float32)
    lens = jnp.asarray([page * pps, 100], jnp.int32)  # include span tokens

    out = paged_attention(q, k_pages, v_pages, lens, table)
    assert out.shape == (batch, span, heads, d)

    pool_k = jnp.transpose(k_pages, (1, 2, 0, 3))
    pool_v = jnp.transpose(v_pages, (1, 2, 0, 3))
    for si in range(span):
        eff = lens - (span - 1 - si)
        ref = paged_decode_ref(q[:, si : si + 1], pool_k, pool_v, eff, table)
        assert_close(out[:, si : si + 1], ref, tol=2e-5,
                     msg=f"span row {si}")


def test_multiquery_windowed():
    batch, kv_heads, group, d = 2, 2, 2, 64
    heads = kv_heads * group
    page, pps, span, window = 64, 4, 4, 63
    kq, k_pages, v_pages, table = _setup(batch, heads, kv_heads, d, page, pps,
                                         key=7)
    q = jax.random.normal(kq, (batch, span, heads, d), jnp.float32)
    lens = jnp.asarray([256, 130], jnp.int32)
    out = paged_attention(q, k_pages, v_pages, lens, table,
                          window_left=window)
    pool_k = jnp.transpose(k_pages, (1, 2, 0, 3))
    pool_v = jnp.transpose(v_pages, (1, 2, 0, 3))
    for si in range(span):
        eff = lens - (span - 1 - si)
        ref = paged_decode_ref(q[:, si : si + 1], pool_k, pool_v, eff, table,
                               window_left=window)
        assert_close(out[:, si : si + 1], ref, tol=2e-5,
                     msg=f"windowed span row {si}")


def test_multiquery_span1_matches_3d():
    """[b, 1, h, d] input must agree with the classic [b, h, d] path."""
    batch, kv_heads, group, d = 2, 2, 2, 64
    heads = kv_heads * group
    page, pps = 64, 3
    kq, k_pages, v_pages, table = _setup(batch, heads, kv_heads, d, page, pps,
                                         key=3)
    q = jax.random.normal(kq, (batch, heads, d), jnp.float32)
    lens = jnp.asarray([150, 64], jnp.int32)
    a = paged_attention(q, k_pages, v_pages, lens, table)
    b = paged_attention(q[:, None], k_pages, v_pages, lens, table)[:, 0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
