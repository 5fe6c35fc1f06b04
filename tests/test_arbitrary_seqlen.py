"""Non-tile-multiple sequence lengths (reference: tests/test_arbitrary_seqlen.py).

The reference kernel handles these with zero-fill predication + in-kernel
masks; the TPU kernel pads to tile multiples and masks columns. Both must be
numerically invisible.
"""

import jax
import jax.numpy as jnp
import pytest

from mfa_tpu import flash_attn_func
from mfa_tpu.ref.oracle import attention_ref
from tests.utils import assert_close, make_qkv

# Reference sweep (tests/test_arbitrary_seqlen.py:13), trimmed for CPU speed.
LENGTHS = [1, 7, 63, 65, 100, 127, 129, 200, 511, 513]


@pytest.mark.parametrize("seqlen", LENGTHS)
def test_arbitrary_seqlen(seqlen):
    q, k, v = make_qkv(jax.random.key(seqlen), 1, seqlen, seqlen, 2, 2, 64)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, msg=f"arb s={seqlen}")


@pytest.mark.parametrize("seqlen", [1, 63, 129, 513])
def test_arbitrary_seqlen_causal(seqlen):
    q, k, v = make_qkv(jax.random.key(seqlen + 1), 1, seqlen, seqlen, 2, 2, 64)
    out = flash_attn_func(q, k, v, causal=True)
    ref = attention_ref(q, k, v, causal=True)
    assert_close(out, ref, msg=f"arb causal s={seqlen}")


@pytest.mark.parametrize("sq,sk", [(256, 257), (257, 256), (1, 300)])
def test_block_boundary(sq, sk):
    # Reference: tests/test_both_seqlens.py:14 (256 vs 257 boundary)
    q, k, v = make_qkv(jax.random.key(7), 1, sq, sk, 2, 2, 64)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, msg=f"boundary {sq}x{sk}")
