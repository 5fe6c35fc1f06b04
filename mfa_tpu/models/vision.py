"""SigLIP vision tower + Gemma3 multimodal glue (TPU-native, jnp/XLA).

The reference framework is attention-kernels-only and has no vision path
at all (SURVEY.md §0); this closes the Gemma3 family out to its full
multimodal surface so "Gemma3 support" means the released checkpoints,
not just their text config. Numerics mirror transformers'
`SiglipVisionModel` + `Gemma3MultiModalProjector` +
`Gemma3Model.get_image_features` (validated in tests/test_hf_convert.py).

Design notes (why there is no Pallas here):
- The tower is a stack of dense [tokens, hidden] matmuls — exactly what
  XLA already maps onto the MXU at full tilt; a hand kernel buys nothing.
- The patchify "conv" is stride==kernel, i.e. a reshape + one matmul —
  no halo, no im2col materialization.
- Image tokens attend BIDIRECTIONALLY within each image while text stays
  causal (transformers token_type_ids or-mask). Multimodal *prefill*
  runs that mask through a dedicated flash kernel
  (kernels/blockmask.py, fed [b, s] image-run ids via llama.forward's
  image_block_ids) with per-q-block KV bounds scalar-prefetched around
  the runs. Decode after the prompt is ordinary causal and reuses every
  serving kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden: int = 1152
    intermediate: int = 4304
    n_layers: int = 27
    n_heads: int = 16
    image_size: int = 896
    patch_size: int = 14
    eps: float = 1e-6
    # Gemma3 projector
    mm_tokens_per_image: int = 256

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads


def init_vision_params(key: jax.Array, vcfg: SiglipVisionConfig,
                       text_dim: int, dtype=jnp.float32):
    """Random-init pytree with the same layout from_hf produces."""
    ks = iter(jax.random.split(key, 8 + 16 * vcfg.n_layers))
    h, ffn, p = vcfg.hidden, vcfg.intermediate, vcfg.patch_size

    def lin(k, i, o):
        return jax.random.normal(k, (i, o), dtype) / math.sqrt(i)

    layers = []
    for _ in range(vcfg.n_layers):
        layers.append(dict(
            ln1_w=jnp.ones((h,), dtype), ln1_b=jnp.zeros((h,), dtype),
            wq=lin(next(ks), h, h), bq=jnp.zeros((h,), dtype),
            wk=lin(next(ks), h, h), bk=jnp.zeros((h,), dtype),
            wv=lin(next(ks), h, h), bv=jnp.zeros((h,), dtype),
            wo=lin(next(ks), h, h), bo=jnp.zeros((h,), dtype),
            ln2_w=jnp.ones((h,), dtype), ln2_b=jnp.zeros((h,), dtype),
            fc1=lin(next(ks), h, ffn), fc1_b=jnp.zeros((ffn,), dtype),
            fc2=lin(next(ks), ffn, h), fc2_b=jnp.zeros((h,), dtype),
        ))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return dict(
        patch_w=lin(next(ks), 3 * p * p, h),
        patch_b=jnp.zeros((h,), dtype),
        pos=jax.random.normal(next(ks), (vcfg.num_patches, h), dtype) * 0.02,
        layers=stacked,
        post_ln_w=jnp.ones((h,), dtype), post_ln_b=jnp.zeros((h,), dtype),
        mm_norm=jnp.zeros((h,), dtype),  # Gemma3RMSNorm: (1 + w)
        mm_proj=lin(next(ks), h, text_dim),
    )


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def siglip_encode(vparams, pixel_values: jax.Array,
                  vcfg: SiglipVisionConfig) -> jax.Array:
    """pixel_values [b, 3, H, W] (HF channel-first convention) ->
    patch features [b, num_patches, hidden] (post_layernorm applied;
    SiglipVisionModel with vision_use_head=False, which is what Gemma3
    instantiates)."""
    b = pixel_values.shape[0]
    p, nps = vcfg.patch_size, vcfg.patches_per_side
    # stride==kernel conv == patchify reshape + matmul (MXU, no im2col)
    x = pixel_values.reshape(b, 3, nps, p, nps, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, nps * nps, 3 * p * p)
    x = x.astype(vparams["patch_w"].dtype) @ vparams["patch_w"]
    x = x + vparams["patch_b"]
    x = x + vparams["pos"][None]

    nh, hd = vcfg.n_heads, vcfg.head_dim
    scale = hd ** -0.5

    def body(x, lp):
        h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], vcfg.eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(b, -1, nh, hd)
        k = (h @ lp["wk"] + lp["bk"]).reshape(b, -1, nh, hd)
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, -1, nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, -1, nh * hd)
        x = x + (o @ lp["wo"] + lp["bo"])
        h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], vcfg.eps)
        x = x + (_gelu_tanh(h2 @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"]
                 + lp["fc2_b"])
        return x, ()

    x, _ = jax.lax.scan(body, x, vparams["layers"])
    return _layer_norm(x, vparams["post_ln_w"], vparams["post_ln_b"],
                       vcfg.eps)


def project_image_features(vparams, vision_out: jax.Array,
                           vcfg: SiglipVisionConfig) -> jax.Array:
    """Gemma3MultiModalProjector: avg-pool the patch grid down to
    mm_tokens_per_image soft tokens, Gemma-RMSNorm, project to text width.
    vision_out [b, num_patches, vh] -> [b, mm_tokens_per_image, text_dim].
    """
    b, n, vh = vision_out.shape
    pp = vcfg.patches_per_side
    tps = int(vcfg.mm_tokens_per_image ** 0.5)
    ksz = pp // tps
    x = vision_out.transpose(0, 2, 1).reshape(b, vh, pp, pp)
    x = x.reshape(b, vh, tps, ksz, tps, ksz).mean(axis=(3, 5))
    x = x.reshape(b, vh, tps * tps).transpose(0, 2, 1)  # [b, mm, vh]
    # Gemma3RMSNorm (zero-centered weight), fp32 like the text stack
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + vcfg.eps) * (
        1.0 + vparams["mm_norm"].astype(jnp.float32))
    return (normed @ vparams["mm_proj"].astype(jnp.float32)
            ).astype(vision_out.dtype)


def gemma3_image_features(vparams, pixel_values, vcfg) -> jax.Array:
    """[n_images, 3, H, W] -> [n_images, mm_tokens_per_image, text_dim]."""
    return project_image_features(
        vparams, siglip_encode(vparams, pixel_values, vcfg), vcfg)


def merge_image_embeds(text_embeds: jax.Array, tokens: jax.Array,
                       image_feats: jax.Array, image_token_id: int):
    """Scatter projected image features over the <image> placeholder rows.

    text_embeds [b, s, d] (already embed-scaled — image rows bypass the
    sqrt(dim) scaling, matching Gemma3TextScaledWordEmbedding which scales
    inside embed_tokens before masked_scatter), tokens [b, s],
    image_feats [n_images, mm, d] flattened in placeholder order.
    """
    b, s, d = text_embeds.shape
    mask = tokens == image_token_id  # [b, s]
    flat = image_feats.reshape(-1, d)
    # k-th placeholder position (row-major over [b, s]) takes feature row k
    idx = (jnp.cumsum(mask.reshape(-1)) - 1).clip(0, flat.shape[0] - 1)
    merged = jnp.where(mask.reshape(-1, 1), flat[idx],
                       text_embeds.reshape(-1, d))
    return merged.reshape(b, s, d)


def image_block_ids_from_tokens(tokens: jax.Array,
                                image_token_id: int) -> jax.Array:
    """[b, s] int32: contiguous <image>-run id per token (-1 = text) —
    the input of the image-block flash kernel (kernels/blockmask.py)."""
    is_img = tokens == image_token_id  # [b, s]
    starts = jnp.logical_and(
        is_img, jnp.logical_not(
            jnp.pad(is_img, ((0, 0), (1, 0)))[:, :-1]))
    group = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
    return jnp.where(is_img, group, -1)


def image_bidir_mask(tokens: jax.Array, image_token_id: int) -> jax.Array:
    """[b, s, s] OR-mask: image tokens of the SAME contiguous image block
    attend to each other bidirectionally (transformers
    token_type_ids_mask_function); everything else stays causal. Dense
    form of image_block_ids_from_tokens — kept as the oracle for
    llama._attention_dense_masked."""
    group = image_block_ids_from_tokens(tokens, image_token_id)
    same = group[:, :, None] == group[:, None, :]
    return jnp.logical_and(same, group[:, :, None] >= 0)


def multimodal_forward(params, vparams, tokens, pixel_values,
                       cfg, vcfg: SiglipVisionConfig,
                       image_token_id: int,
                       mesh=None) -> jax.Array:
    """Gemma3 conditional-generation forward -> logits [b, s, vocab].

    tokens [b, s] with image_token_id placeholder runs (mm_tokens_per_image
    per image); pixel_values [n_images, 3, H, W] in placeholder order.
    """
    from mfa_tpu.models import llama

    feats = gemma3_image_features(vparams, pixel_values, vcfg)
    embeds = llama._embed(params, tokens, cfg)
    embeds = merge_image_embeds(embeds, tokens, feats, image_token_id)
    bids = image_block_ids_from_tokens(tokens, image_token_id)
    return llama.forward(params, tokens, cfg, mesh=mesh,
                         input_embeds=embeds, image_block_ids=bids)


def multimodal_generate_greedy(params, vparams, tokens, pixel_values,
                               cfg, vcfg, image_token_id: int,
                               max_new_tokens: int):
    """Greedy decode by full-forward recomputation (parity harness for
    tests; production text serving uses the paged engine — the image
    tokens live entirely in the prompt so the post-prompt mask is plain
    causal)."""
    toks = tokens
    out = []
    for _ in range(max_new_tokens):
        logits = multimodal_forward(params, vparams, toks, pixel_values,
                                    cfg, vcfg, image_token_id)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        out.append(int(nxt[0]))
        toks = jnp.concatenate([toks, nxt[:, None].astype(toks.dtype)], 1)
    return out
