"""nnUNet plans.json -> SegModel arch adapter (reference train_all.py:466-493)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rehrseg_tpu.models import SegModel, arch_from_plans


PLANS = {
    "configurations": {
        "3d_fullres": {
            "patch_size": [16, 128, 160],
            "architecture": {
                "arch_kwargs": {
                    "n_stages": 5,
                    "features_per_stage": [32, 64, 128, 256, 320],
                    "kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3],
                                     [3, 3, 3], [3, 3, 3]],
                    "strides": [[1, 1, 1], [1, 2, 2], [2, 2, 2],
                                [2, 2, 2], [1, 2, 2]],
                    "n_conv_per_stage": 2,
                    "n_conv_per_stage_decoder": 2,
                    "conv_bias": True,
                    "norm_op_kwargs": {"eps": 1e-5, "affine": True},
                    "nonlin_kwargs": {"negative_slope": 0.01, "inplace": True},
                }
            },
        }
    }
}


def test_arch_from_plans_scalars_expand():
    arch, patch = arch_from_plans(PLANS)
    assert patch == [16, 128, 160]
    assert arch["n_stages"] == 5
    # scalar n_conv_per_stage expands per stage like nnUNet does
    assert arch["n_conv_per_stage"] == (2,) * 5
    assert arch["n_conv_per_stage_decoder"] == (2,) * 4
    assert arch["norm_eps"] == 1e-5 and arch["nonlin_slope"] == 0.01


@pytest.mark.heavy
def test_plans_arch_builds_and_packs(rng):
    """A plans-derived SegModel runs both forwards at the plans patch and
    the packed path matches."""
    from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed

    arch, patch = arch_from_plans(PLANS)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    x = jnp.asarray(rng.normal(size=(1, *patch, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    ref_lr, ref_hr = model.apply(params, x)
    assert ref_lr.shape == (1, 16, 128, 160, 2)
    assert ref_hr.shape == (1, 64, 128, 160, 2)
    got = segmodel_apply_packed(arch, params, x, pack_max_channels=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
