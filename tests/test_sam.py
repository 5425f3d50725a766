"""SAM-Med2D promptable segmentation: shape contracts, prompt sensitivity,
jit-ability, and a short training loop that actually reduces the SAM loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mdeical_image_segmentation_tpu.models.sam import SAMMed2D, sam_loss


@pytest.fixture(scope="module")
def small_sam(rng):
    model = SAMMed2D(img_size=64, in_channels=1, embed_dim=64, encoder_depth=2,
                     encoder_heads=4, prompt_embed_dim=64)
    img = jnp.zeros((1, 64, 64, 1))
    pts = jnp.zeros((1, 1, 2))
    lbl = jnp.ones((1, 1), jnp.int32)
    variables = model.init(rng, img, pts, lbl)
    return model, variables


class TestShapes:
    def test_single_and_multimask(self, small_sam):
        model, v = small_sam
        img = jnp.zeros((2, 64, 64, 1))
        pts = jnp.asarray([[[32.0, 32.0]], [[10.0, 50.0]]])
        lbl = jnp.ones((2, 1), jnp.int32)
        masks, iou = model.apply(v, img, pts, lbl)
        assert masks.shape == (2, 1, 16, 16) and iou.shape == (2, 1)
        m3, i3 = model.apply(v, img, pts, lbl, multimask_output=True)
        assert m3.shape == (2, 3, 16, 16) and i3.shape == (2, 3)

    def test_boxes_and_mask_prompt(self, small_sam):
        model, v = small_sam
        img = jnp.zeros((1, 64, 64, 1))
        pts = jnp.zeros((1, 1, 2))
        lbl = -jnp.ones((1, 1), jnp.int32)  # all-pad points; box drives it
        boxes = jnp.asarray([[[8.0, 8.0], [56.0, 56.0]]])
        mask_in = jnp.zeros((1, 16, 16, 1))
        masks, _ = model.apply(v, img, pts, lbl, boxes, mask_in)
        assert masks.shape == (1, 1, 16, 16)

    def test_jit(self, small_sam):
        model, v = small_sam
        f = jax.jit(lambda v, i, p, l: model.apply(v, i, p, l))
        m, _ = f(v, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 1, 2)),
                 jnp.ones((1, 1), jnp.int32))
        assert m.shape == (1, 1, 16, 16)


def test_prompt_location_changes_mask(small_sam):
    model, v = small_sam
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1), jnp.float32)
    lbl = jnp.ones((1, 1), jnp.int32)
    m1, _ = model.apply(v, img, jnp.asarray([[[10.0, 10.0]]]), lbl)
    m2, _ = model.apply(v, img, jnp.asarray([[[50.0, 50.0]]]), lbl)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_padded_points_are_inert(small_sam):
    """A pad-labeled point must not change the output vs not providing it."""
    model, v = small_sam
    img = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 1), jnp.float32)
    m_ref, _ = model.apply(
        v, img, jnp.asarray([[[20.0, 20.0], [0.0, 0.0]]]),
        jnp.asarray([[1, -1]]),
    )
    m_moved_pad, _ = model.apply(
        v, img, jnp.asarray([[[20.0, 20.0], [55.0, 13.0]]]),
        jnp.asarray([[1, -1]]),
    )
    np.testing.assert_allclose(
        np.asarray(m_ref), np.asarray(m_moved_pad), atol=1e-5
    )


def test_sam_training_reduces_loss(rng):
    """Overfit a tiny SAM to 'segment the blob at the prompted point'."""
    model = SAMMed2D(img_size=64, in_channels=1, embed_dim=64, encoder_depth=2,
                     encoder_heads=4, prompt_embed_dim=64)

    rs = np.random.RandomState(0)
    imgs, pts, targets = [], [], []
    for i in range(8):
        cy, cx = rs.randint(16, 48, 2)
        yy, xx = np.mgrid[0:64, 0:64]
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < 100).astype(np.float32)
        imgs.append(mask[..., None] * 0.8 + 0.1 * rs.rand(64, 64, 1))
        pts.append([[float(cx), float(cy)]])
        targets.append(mask)
    imgs = jnp.asarray(np.stack(imgs), jnp.float32)
    pts = jnp.asarray(pts)
    lbl = jnp.ones((8, 1), jnp.int32)
    targets = jnp.asarray(np.stack(targets))

    variables = model.init(rng, imgs[:1], pts[:1], lbl[:1])
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            m, i = model.apply({"params": p}, imgs, pts, lbl)
            return sam_loss(m, i, targets)

        loss, g = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    params, opt_state, first = step(params, opt_state)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < float(first) * 0.7
