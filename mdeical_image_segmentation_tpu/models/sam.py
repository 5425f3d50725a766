"""SAM-Med2D-style promptable 2D segmentation (TPU-native, Flax).

The reference's README roadmap (README.md:26) and BASELINE.json config #5
name SAM-Med2D promptable segmentation as the intended next model family.
This is a from-scratch segment-anything architecture (Kirillov et al. 2023;
Cheng et al., SAM-Med2D 2023) in the framework's idiom:

- ``ImageEncoderViT`` — patch-embed conv + pre-LN transformer encoder with
  learned positional embeddings and a 2-conv neck to the prompt/mask
  embedding width.  Global attention (medical 2D inputs at 256px → 256
  tokens) keeps everything as large MXU matmuls.
- ``PromptEncoder`` — points (fg/bg), boxes (corner pair) and dense mask
  prompts; sparse prompts are random-Fourier positional encodings + learned
  type embeddings, dense prompts a small conv stack; a learned no-mask
  embedding otherwise.
- ``MaskDecoder`` — two-way transformer (token→image and image→token cross
  attention), 4× transposed-conv upscaling, per-mask hypernetwork MLPs and
  an IoU prediction head; 1 + ``num_multimask_outputs`` candidate masks.
- ``SAMMed2D`` — bundles the three; ``__call__(image, point_coords,
  point_labels, boxes, mask_inputs)`` → (low-res mask logits, iou
  predictions).  ``sam_loss`` provides the focal+dice+IoU-MSE training
  objective of the SAM recipe.

Everything is static-shape jit-able: prompts are fixed-width arrays with a
validity convention (label -1 = padding, matching SAM's).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MLPBlock(nn.Module):
    mlp_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(d, dtype=self.dtype)(x)


class Attention(nn.Module):
    num_heads: int
    downsample_rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, q, k, v):
        d = q.shape[-1]
        inner = d // self.downsample_rate
        head = inner // self.num_heads

        def proj(x, name):
            y = nn.Dense(inner, dtype=self.dtype, name=name)(x)
            b, n, _ = y.shape
            return y.reshape(b, n, self.num_heads, head).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q_proj"), proj(k, "k_proj"), proj(v, "v_proj")
        attn = (qh @ kh.transpose(0, 1, 3, 2)) / math.sqrt(head)
        attn = jax.nn.softmax(attn, axis=-1)
        out = attn @ vh
        b, h, n, hd = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + Attention(self.num_heads, dtype=self.dtype)(h, h, h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        return x + MLPBlock(int(d * self.mlp_ratio), dtype=self.dtype)(h)


class ImageEncoderViT(nn.Module):
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 6
    num_heads: int = 6
    out_chans: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C) -> (B, h, w, out)
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        b, h, w, d = x.shape
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, h, w, d)
        )
        x = (x + pos).reshape(b, h * w, d)
        for i in range(self.depth):
            x = TransformerBlock(self.num_heads, dtype=self.dtype,
                                 name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype)(x).reshape(b, h, w, d)
        # neck: 1x1 then 3x3, LayerNorm between (SAM's neck uses LN2d)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (16, 16)
    input_image_size: Tuple[int, int] = (256, 256)
    mask_in_chans: int = 16
    dtype: Optional[Any] = None

    def setup(self):
        scale = 1.0
        self.pe_gaussian = self.param(
            "pe_gaussian",
            lambda k, s: scale * jax.random.normal(k, s),
            (2, self.embed_dim // 2),
        )
        # 0: bg point, 1: fg point, 2: box corner A, 3: box corner B, 4: pad
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (5, self.embed_dim),
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_downscale = nn.Sequential(
            [
                nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                        dtype=self.dtype),
                nn.LayerNorm(dtype=self.dtype),
                nn.gelu,
                nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                        dtype=self.dtype),
                nn.LayerNorm(dtype=self.dtype),
                nn.gelu,
                nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype),
            ]
        )

    def _pe_encode(self, coords: jax.Array) -> jax.Array:
        """Random-Fourier positional encoding of [0,1]² coords."""
        coords = 2.0 * coords - 1.0
        proj = coords @ self.pe_gaussian  # (..., embed//2)
        proj = 2.0 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self) -> jax.Array:
        """Positional encoding of the image-embedding grid (h, w, D)."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h,w,2)
        return self._pe_encode(grid)

    def __call__(
        self,
        point_coords: Optional[jax.Array],  # (B, P, 2) in input pixels
        point_labels: Optional[jax.Array],  # (B, P): 1 fg, 0 bg, -1 pad
        boxes: Optional[jax.Array] = None,  # (B, 2, 2) corner pixels
        mask_inputs: Optional[jax.Array] = None,  # (B, 4h, 4w, 1)
    ):
        sparse = []
        ih, iw = self.input_image_size
        if point_coords is not None:
            coords = point_coords / jnp.asarray([iw, ih], jnp.float32)
            pe = self._pe_encode(coords)  # (B, P, D)
            lab = point_labels
            emb = jnp.where(
                (lab == 1)[..., None], self.point_embeddings[1],
                jnp.where(
                    (lab == 0)[..., None], self.point_embeddings[0],
                    self.point_embeddings[4],
                ),
            )
            pe = jnp.where((lab == -1)[..., None], 0.0, pe)
            sparse.append(pe + emb)
        if boxes is not None:
            coords = boxes / jnp.asarray([iw, ih], jnp.float32)
            pe = self._pe_encode(coords)  # (B, 2, D)
            pe = pe + jnp.stack(
                [self.point_embeddings[2], self.point_embeddings[3]]
            )
            sparse.append(pe)
        if sparse:
            sparse_embeddings = jnp.concatenate(sparse, axis=1)
        else:
            raise ValueError("at least one of points/boxes must be provided")

        h, w = self.image_embedding_size
        if mask_inputs is not None:
            dense_embeddings = self.mask_downscale(mask_inputs)
        else:
            b = sparse_embeddings.shape[0]
            if self.is_initializing():
                # trace the mask path at init so its params always exist
                self.mask_downscale(jnp.zeros((b, 4 * h, 4 * w, 1)))
            dense_embeddings = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1),
                (b, h, w, self.embed_dim),
            )
        return sparse_embeddings, dense_embeddings


class TwoWayBlock(nn.Module):
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # self attention on tokens
        if self.skip_first_layer_pe:
            queries = Attention(self.num_heads, dtype=self.dtype,
                                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(dtype=self.dtype)(queries)
        # tokens -> image
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.num_heads, downsample_rate=2, dtype=self.dtype,
            name="cross_attn_t2i",
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype)(queries)
        queries = queries + MLPBlock(self.mlp_dim, dtype=self.dtype)(queries)
        queries = nn.LayerNorm(dtype=self.dtype)(queries)
        # image -> tokens
        q = queries + query_pe
        keys = keys + Attention(
            self.num_heads, downsample_rate=2, dtype=self.dtype,
            name="cross_attn_i2t",
        )(k, q, queries)
        keys = nn.LayerNorm(dtype=self.dtype)(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    depth: int = 2
    num_heads: int = 8
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompts, dense_prompts):
        b, h, w, d = image_embeddings.shape
        n_mask_tokens = self.num_multimask_outputs + 1

        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, d)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask_tokens, d)
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (b, *output_tokens.shape)),
             sparse_prompts],
            axis=1,
        )

        src = (image_embeddings + dense_prompts).reshape(b, h * w, d)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, d), (b, h * w, d))

        queries, keys = tokens, src
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                self.num_heads, skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"block{i}",
            )(queries, keys, tokens, pos)
        # final token->image attention
        q = queries + tokens
        k = keys + pos
        queries = queries + Attention(
            self.num_heads, downsample_rate=2, dtype=self.dtype,
            name="final_attn",
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype)(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + n_mask_tokens]

        # upscale image features 4x
        src = keys.reshape(b, h, w, d)
        src = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                               dtype=self.dtype)(src)
        src = nn.LayerNorm(dtype=self.dtype)(src)
        src = nn.gelu(src)
        src = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                               dtype=self.dtype)(src)
        src = nn.gelu(src)  # (B, 4h, 4w, d/8)

        # hypernetwork MLPs per mask token
        hyper = []
        for i in range(n_mask_tokens):
            t = mask_out[:, i]
            for j in range(2):
                t = nn.relu(nn.Dense(d, dtype=self.dtype,
                                     name=f"hyper{i}_l{j}")(t))
            hyper.append(nn.Dense(d // 8, dtype=self.dtype,
                                  name=f"hyper{i}_out")(t))
        hyper = jnp.stack(hyper, axis=1)  # (B, M, d/8)

        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, src)

        # IoU head
        t = iou_out
        for j in range(self.iou_head_depth - 1):
            t = nn.relu(nn.Dense(d, dtype=self.dtype, name=f"iou_l{j}")(t))
        iou_pred = nn.Dense(n_mask_tokens, dtype=self.dtype, name="iou_out")(t)
        return masks, iou_pred


class SAMMed2D(nn.Module):
    """Promptable 2D segmentation: ViT encoder + prompt encoder + two-way
    mask decoder.  ``multimask_output`` selects the 3 candidate masks vs the
    single primary mask."""

    img_size: int = 256
    in_channels: int = 1
    embed_dim: int = 384
    encoder_depth: int = 6
    encoder_heads: int = 6
    prompt_embed_dim: int = 256
    decoder_depth: int = 2
    num_multimask_outputs: int = 3
    dtype: Optional[Any] = None

    def setup(self):
        grid = self.img_size // 16
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, embed_dim=self.embed_dim,
            depth=self.encoder_depth, num_heads=self.encoder_heads,
            out_chans=self.prompt_embed_dim, dtype=self.dtype,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.img_size, self.img_size),
            dtype=self.dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=self.prompt_embed_dim, depth=self.decoder_depth,
            num_multimask_outputs=self.num_multimask_outputs, dtype=self.dtype,
        )

    def __call__(
        self,
        image: jax.Array,  # (B, H, W, C)
        point_coords: Optional[jax.Array] = None,  # (B, P, 2)
        point_labels: Optional[jax.Array] = None,  # (B, P)
        boxes: Optional[jax.Array] = None,  # (B, 2, 2)
        mask_inputs: Optional[jax.Array] = None,
        multimask_output: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        img_emb = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(
            point_coords, point_labels, boxes, mask_inputs
        )
        masks, iou_pred = self.mask_decoder(
            img_emb, self.prompt_encoder.dense_pe(), sparse, dense
        )
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


def sam_loss(
    mask_logits: jax.Array,  # (B, 1, h, w) low-res logits
    iou_pred: jax.Array,  # (B, 1)
    target: jax.Array,  # (B, H, W) binary ground truth
    *,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    focal_weight: float = 20.0,
) -> jax.Array:
    """SAM training objective: 20·focal + dice + IoU-MSE (per the paper)."""
    from ..ops.image import resize_bilinear

    b, m, h, w = mask_logits.shape
    logits = mask_logits[:, 0]
    if target.shape[1:] != (h, w):
        t = resize_bilinear(target[..., None].astype(jnp.float32), (h, w))[..., 0]
        t = (t > 0.5).astype(jnp.float32)
    else:
        t = target.astype(jnp.float32)

    p = jax.nn.sigmoid(logits)
    # focal
    ce = -(t * jax.nn.log_sigmoid(logits) + (1 - t) * jax.nn.log_sigmoid(-logits))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = focal_alpha * t + (1 - focal_alpha) * (1 - t)
    focal = (alpha_t * (1 - p_t) ** focal_gamma * ce).mean()
    # dice
    inter = (p * t).sum(axis=(1, 2))
    dice = 1 - (2 * inter + 1.0) / (p.sum(axis=(1, 2)) + t.sum(axis=(1, 2)) + 1.0)
    dice = dice.mean()
    # iou supervision
    pred_mask = p > 0.5
    gt_iou = ((pred_mask * t).sum(axis=(1, 2)) + 1e-6) / (
        (jnp.maximum(pred_mask, t)).sum(axis=(1, 2)) + 1e-6
    )
    iou_mse = jnp.square(iou_pred[:, 0] - jax.lax.stop_gradient(gt_iou)).mean()
    return focal_weight * focal + dice + iou_mse


# ---------------------------------------------------------------------------
# persistence (serving / checkpointing)
# ---------------------------------------------------------------------------


def save_sam(path: str, model: SAMMed2D, variables) -> None:
    """Write a SAM bundle (config.json + params.msgpack)."""
    import json
    import os

    import flax

    os.makedirs(path, exist_ok=True)
    config = {
        "img_size": model.img_size,
        "in_channels": model.in_channels,
        "embed_dim": model.embed_dim,
        "encoder_depth": model.encoder_depth,
        "encoder_heads": model.encoder_heads,
        "prompt_embed_dim": model.prompt_embed_dim,
        "decoder_depth": model.decoder_depth,
        "num_multimask_outputs": model.num_multimask_outputs,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def load_sam(path: str):
    """Restore a SAM bundle saved by save_sam → (model, variables)."""
    import json
    import os

    import flax
    import jax

    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    model = SAMMed2D(**config)
    img = jnp.zeros((1, config["img_size"], config["img_size"],
                     config["in_channels"]), jnp.float32)
    pts = jnp.zeros((1, 1, 2))
    lbl = jnp.ones((1, 1), jnp.int32)
    # structure-only template via eval_shape: no device work, no compile
    # (an eager init costs minutes through a remote-device tunnel, r5)
    import numpy as np

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, pts, lbl)
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    return model, variables
