"""Init-statistics parity with torch for conv / transposed-conv kernels.

torch's ``_calculate_fan_in_and_fan_out`` counts weight dim 1 as fan_in
(times the receptive field).  For Conv2d (O, I, kH, kW) that is I*k²; for
ConvTranspose2d (I, O, kH, kW) it is O*k² — so a transposed conv's default
init bound differs from a conv's by sqrt(I/O) whenever I != O (round-3
review finding: the flax kernels got the conv rule everywhere).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mdeical_image_segmentation_tpu.ops import initializers as tinit


KEY = jax.random.PRNGKey(0)


class TestTransposedFan:
    # flax ConvTranspose kernel layout: (kH, kW, In, Out), In=32, Out=8
    SHAPE = (4, 4, 32, 8)

    def test_torch_default_bound_matches_torch_deconv(self):
        w = tinit.torch_conv_default_kernel(transpose=True)(KEY, self.SHAPE)
        # torch oracle: ConvTranspose2d(32, 8, 4) default kaiming_uniform
        m = torch.nn.ConvTranspose2d(32, 8, 4)
        t_bound = float(m.weight.abs().max())  # ≤ 1/sqrt(8*16) by construction
        bound = 1.0 / math.sqrt(8 * 16)
        assert float(jnp.abs(w).max()) <= bound + 1e-7
        assert t_bound <= bound + 1e-7
        # the sample must actually fill the torch bound (fails if the fan
        # were computed from In: bound would be 1/sqrt(32*16), 2x smaller)
        assert float(jnp.abs(w).max()) > bound * 0.98

    def test_kaiming_std_matches_torch_deconv(self):
        w = tinit.kaiming_normal(transpose=True)(KEY, self.SHAPE)
        torch.manual_seed(0)
        tw = torch.empty(32, 8, 4, 4)
        torch.nn.init.kaiming_normal_(tw)  # fan_in = 8*16
        want = math.sqrt(2.0 / (8 * 16))
        np.testing.assert_allclose(float(jnp.std(w)), want, rtol=0.05)
        np.testing.assert_allclose(float(tw.std()), want, rtol=0.05)

    def test_conv_rule_unchanged(self):
        # non-transposed kernels keep fan_in = I * k² (torch Conv2d rule)
        w = tinit.torch_conv_default_kernel()(KEY, self.SHAPE)
        bound = 1.0 / math.sqrt(32 * 16)
        assert float(jnp.abs(w).max()) <= bound + 1e-7
        assert float(jnp.abs(w).max()) > bound * 0.98

    def test_orthogonal_transpose_rows(self):
        """torch orthogonal_ on a deconv weight orthogonalizes
        w.view(In, Out*k²) — In=32 rows of length 128 are orthonormal."""
        w = tinit.orthogonal(transpose=True)(KEY, self.SHAPE)
        assert w.shape == self.SHAPE
        rows = np.asarray(w).reshape(16, 32, 8)  # (k², In, Out)
        mat = np.moveaxis(rows, 1, 0).reshape(32, 16 * 8)
        gram = mat @ mat.T
        np.testing.assert_allclose(gram, np.eye(32), atol=1e-4)

    def test_xavier_symmetric(self):
        a = tinit.xavier_normal()(KEY, self.SHAPE)
        b = tinit.xavier_normal(transpose=True)(KEY, self.SHAPE)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_upsample_module_uses_deconv_fan():
    """Classic-UNet UpSample (ConvTranspose k2 s2, In=2f → Out=f): kernel
    bound must be the torch deconv 1/sqrt(f*4), not 1/sqrt(2f*4)."""
    from mdeical_image_segmentation_tpu.models.layers2d import UpSample

    f = 16
    m = UpSample(features=f)
    v = m.init(KEY, jnp.zeros((1, 8, 8, 2 * f)))
    (k,) = [x for x in jax.tree_util.tree_leaves(v["params"]) if x.ndim == 4]
    bound = 1.0 / math.sqrt(f * 4)
    assert float(jnp.abs(k).max()) <= bound + 1e-7
    assert float(jnp.abs(k).max()) > bound * 0.9
